"""Version-compat shim for shard_map across jax releases."""

try:
    from jax import shard_map  # jax >= 0.6 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # noqa: F401
