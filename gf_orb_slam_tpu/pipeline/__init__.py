"""SLAM pipeline orchestration (reference layer L5): per-frame tracking
programs, per-keyframe local mapping, and the full-system state machine.
"""
