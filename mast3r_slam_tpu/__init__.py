"""mast3r_slam_tpu: TPU-native real-time dense SLAM engine.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
MASt3R-SLAM (two-view pointmap prediction, dense projective matching, Sim(3)
tracking, keyframe factor-graph backend with retrieval loop closure).
"""

__version__ = "0.1.0"
