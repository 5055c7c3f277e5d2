"""Map data model (reference layer L2) re-architected as struct-of-arrays
device state with fixed capacities and validity masks — no pointer graphs, no
mutexes; every update is a functional array transform.
"""
