"""Model registry (reference ``models/build.py:4-15``)."""

from ..utils.registry import Registry

MODELS = Registry("models")


def build_model_from_cfg(cfg, **kwargs):
    """Construct a model definition from a config node with a NAME field."""
    return MODELS.build(cfg, **kwargs)


def jit_init(model, rngs, *args, **kwargs):
    """``model.init`` under jit — one compiled program instead of thousands of
    eagerly dispatched ops (critical on remote/tunneled backends where every
    eager op is a network round-trip). kwargs must be static (flags/ints)."""
    import jax

    fn = jax.jit(lambda r, a: model.init(r, *a, **kwargs))
    return fn(rngs, args)
