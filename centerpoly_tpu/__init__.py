"""centerpoly_tpu — a TPU-native re-build of CenterPoly v2.

Real-time instance segmentation with polygons: a CenterNet-style anchor-free
detector predicting, per object center, a class heatmap peak, a fixed-size
polygon (N vertices), and a pseudo-depth scalar for occlusion ordering.

Reference capability surface: KatiaJDL/CenterPoly (PyTorch+CUDA).  This
package is a from-scratch JAX/Flax/Pallas implementation designed for TPU:
NHWC layouts, fixed shapes under jit, vectorized decode, and a fixed-shape
differentiable polygon-IoU loss.
"""

__version__ = "0.1.0"
