"""umetrack_tpu — a TPU-native multi-view hand-tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/UmeTrack (reference layout documented in SURVEY.md):

- ``geometry``   : cameras (pinhole / fisheye62), affine math, crop-camera fitting
- ``kinematics`` : 22-DoF hand model, forward kinematics + linear-blend skinning
- ``models``     : Flax NN model (ResNet backbone, FTL, multi-view fusion,
                   conv-RNN temporal model, skeleton encoder, pose regressors)
- ``ops``        : image resampling / perspective-warp kernels (jnp + Pallas)
- ``tracker``    : fully on-device temporal hand tracker (lax.scan over frames)
- ``data``       : idx/bin dataset reader, label parsing, host input pipeline
- ``parallel``   : mesh / sharding helpers, distributed eval + train steps
- ``apps``       : entry points reproducing the reference eval protocols
"""

__version__ = "0.1.0"
