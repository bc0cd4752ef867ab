"""applied-image-processing-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the
Applied-Image-Processing style-transfer suite.

Capability parity target: Ayushkuruvilla/Applied-Image-Processing (see SURVEY.md).
Architecture is TPU-first: NHWC layouts, bfloat16 matmuls on the MXU, fused
XLA graphs, Pallas kernels for the hot ops, and jax.sharding meshes for
multi-chip scale-out.

Subpackages
-----------
ops        pure-array kernels (AdaIN stats, color spaces, resize, SH, flow, ...)
models     VGG encoder / AdaIN decoder / hashgrid+MLP color field / depth & seg nets
pipelines  end-to-end user-facing pipelines (2D stylization, video, pixel-art, NST)
gs         3D Gaussian Splatting vertical (scene IO, model, rasterizer, training)
parallel   mesh construction, shardings, pjit train/infer steps
data       host-side IO (images, video frames, COLMAP)
cli        command-line entry points mirroring the reference's CLI surface
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt-out: AIP_TPU_NO_COMPILE_CACHE).

    Every pipeline is a handful of large jitted programs; cold-starting a
    CLI or GUI process pays tens of seconds of recompiles for graphs that
    never change. Caching compiled executables on disk makes every process
    after the first warm-start (the real-video driver spends most of its
    cold 4 minutes in compiles). Serving-oriented default; failures (e.g.
    read-only home) silently fall back to in-memory-only behavior.
    """
    import os

    if os.environ.get("AIP_TPU_NO_COMPILE_CACHE"):
        return
    # TPU (axon) processes only: that's where compiles cost tens of
    # seconds. CPU AOT cache entries additionally warn on load when the
    # compiler's synthetic machine-feature flags (prefer-no-scatter/...)
    # don't literally match the host's detected set — not worth the noise
    # for sub-second CPU compiles.
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        return  # virtual-CPU-mesh run (driver dryrun / tests), not the TPU
    try:
        import jax

        # Scope the cache by a host fingerprint: the cache dir lives in the
        # (persistent) home, but VM restarts can land on a different host
        # whose CPU features don't match previously cached CPU AOT
        # executables — XLA logs "could lead to execution errors such as
        # SIGILL" and loads them anyway. A per-host dir trades a one-time
        # recompile after a host move for never executing stale binaries.
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                flags = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            flags = ""
        host_tag = hashlib.md5(flags.encode()).hexdigest()[:8]
        cache_dir = os.environ.get(
            "AIP_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "aip_tpu",
                         f"xla-{host_tag}"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
