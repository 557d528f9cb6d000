"""loc_lib_tpu: a TPU-native SLAM / LiDAR-localization engine.

Brand-new JAX/XLA/Pallas rebuild of the capabilities of the reference C++
library `maotian123/loc_lib` (LocUtils + slam_demo). See SURVEY.md for the
blueprint and the file:line parity citations in each module's docstring.
"""

__version__ = "0.1.0"
