"""ws_mgmap_tpu — TPU-native multi-granularity map learning for VLN-CE.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
PeihaoChen/WS-MGMap (NeurIPS 2022): egocentric RGB-D -> multi-granularity
top-down map -> cross-modal waypoint policy, trained with two-stage DAgger
imitation, evaluated against Habitat on the host.

Layers (bottom-up):
  ops/       pure-JAX + Pallas geometry (projection, splat, map registration)
  models/    Flax modules (UNet, depth ResNet50, map enc/dec, CMA policy)
  parallel/  mesh + sharding helpers (data-parallel psum over ICI)
  train/     teacher-forcing / DAgger trainers, replay store, checkpoints
  env/       host-side task layer: sim backend protocol, sensors, measures,
             vectorized envs, action makers
  config/    yacs-surface config tree + experiment YAMLs
"""

__version__ = "0.1.0"
