"""Loop closing (reference src/LoopClosing.cc): detection, Sim3 verification,
and map correction via essential-graph optimization.
"""
