"""Differentiable ops: PDE stencils, losses, metrics, fused Pallas kernels."""

from . import losses, metrics, pde, pool, stats  # noqa: F401

__all__ = ["pde", "losses", "metrics", "pool", "stats", "pallas_physics"]


def __getattr__(name):
    # pallas_physics imports jax.experimental.pallas; load lazily so the
    # core ops stay importable in minimal environments.  (Must use
    # import_module — `from . import x` re-enters this __getattr__.)
    if name == "pallas_physics":
        import importlib

        mod = importlib.import_module(".pallas_physics", __name__)
        globals()["pallas_physics"] = mod
        return mod
    raise AttributeError(name)
