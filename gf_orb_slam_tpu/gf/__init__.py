"""Good-Feature engine: observability Jacobians, info matrices, Max-logDet
submodular selection, and active matching (reference src/Observability.cc).
"""
