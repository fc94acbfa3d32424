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


def _default_compilation_cache() -> None:
    """Persistent XLA compilation cache (compiles via the remote-compile
    tunnel run minutes; caching makes repeat runs instant).  Opt out with
    UMETRACK_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("UMETRACK_NO_COMPILE_CACHE"):
        return
    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/umetrack_jax"),
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_default_compilation_cache()

