"""multi_modal_regression_tpu — TPU-native mixed classification-regression pose framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
JHUVisionLab/multi-modal-regression (BMVC'18, arXiv:1805.03225 / 1807.07226):
3D object pose (viewpoint) estimation on SO(3) with bin-and-delta multimodal
heads over learned pose dictionaries, for PASCAL3D+ and ObjectNet3D.

Subpackages
-----------
geometry    SO(3)/quaternion math core (batched, jit/vmap-safe)
metrics     host-side evaluation metrics (geodesic error, AVP/ARP detection)
dictionary  pose-dictionary learning (kmeans / GMM) in JAX
ops         Pallas TPU kernels + XLA fallbacks (preprocess, distances)
models      flax backbones (ResNet/VGG) and vectorized bin-delta model zoo
losses      the full bin-delta loss zoo as pure functions
data        class-balanced datasets, host loaders, on-device target transforms
parallel    device-mesh / sharding helpers (SPMD via pjit/shard_map)
train       Trainer, schedules (cyclical LR), snapshot-ensemble evaluation
configs     one structured config with per-experiment presets
tools       data preparation (crops/flips/augmentation) + synthetic datasets
utils       IO and logging helpers
"""

__version__ = "0.1.0"

# Numeric precision constant shared across the framework.
# Mirrors the reference convention (helperFunctions.py:20).
EPS = 1e-6

# The 12 PASCAL3D+ object categories of interest (helperFunctions.py:16).
PASCAL3D_CLASSES = (
    "aeroplane", "bicycle", "boat", "bottle", "bus", "car",
    "chair", "diningtable", "motorbike", "sofa", "train", "tvmonitor",
)
