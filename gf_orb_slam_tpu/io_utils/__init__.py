"""Dataset IO, synthetic scene generation, configuration, trajectory output,
and evaluation (reference layer L6/L7 minus ROS).
"""
