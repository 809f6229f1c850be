"""Version-compat shims for shard_map / varying-axis casts across jax
releases."""

import jax

try:
    from jax import shard_map  # jax >= 0.6 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # noqa: F401


def pvary(x, axis_name: str):
    """Mark a replicated value as varying over `axis_name` (needed to mix
    replicated constants into per-shard arithmetic under shard_map's
    varying-manual-axes checking)."""
    try:
        return jax.lax.pcast(x, (axis_name,), to="varying")
    except AttributeError:  # pragma: no cover - older jax
        return jax.lax.pvary(x, (axis_name,))
