"""SMoE parameter pytree.

The reference keeps per-kernel parameters in six TF variables plus a parallel
"inc" set and splices with strided assigns (reference smoe.py:388-452).  Here
everything is one frozen flax-style pytree of fixed-capacity arrays; kernel
liveness is expressed by `pis > 0` masks, never by shape changes, so every jit
trace has static shapes (XLA requirement).

Parameter semantics (reference smoe.py table, SURVEY.md §0):
    musX    (K, d)      kernel centers in [0,1]^d
    a_diag  (K, d, d)   diagonal part of the Cholesky-ish factor (only the
                        diagonal entries are ever read); (K,) when radial
    a_corr  (K, d, d)   strictly-lower part (zeros when radial)
    pis     (K,)        gating weights; pis <= 0 means "dead kernel"
    nu_e    (K, C)      expert offsets
    gamma_e (K, d, C)   expert slopes
    motion  (8, F)      optional per-frame global-motion params h11..h32
    sv / sv_bw_*        optional per-pixel support-vector residual
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from smoe_tpu.config import SmoeConfig


@jax.tree_util.register_pytree_node_class
class SmoeParams:
    """Immutable pytree of SMoE parameters (fixed capacity K)."""

    FIELDS = ("musX", "a_diag", "a_corr", "pis", "nu_e", "gamma_e",
              "motion", "sv", "sv_bw_diag", "sv_bw_corr")

    def __init__(self, musX, a_diag, a_corr, pis, nu_e, gamma_e,
                 motion=None, sv=None, sv_bw_diag=None, sv_bw_corr=None):
        self.musX = musX
        self.a_diag = a_diag
        self.a_corr = a_corr
        self.pis = pis
        self.nu_e = nu_e
        self.gamma_e = gamma_e
        self.motion = motion
        self.sv = sv
        self.sv_bw_diag = sv_bw_diag
        self.sv_bw_corr = sv_bw_corr

    # -- pytree protocol --
    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self.FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def replace(self, **kw) -> "SmoeParams":
        d = {f: getattr(self, f) for f in self.FIELDS}
        d.update(kw)
        return SmoeParams(**d)

    # -- convenience --
    @property
    def capacity(self) -> int:
        return self.pis.shape[0]

    @property
    def dim_domain(self) -> int:
        return self.musX.shape[1]

    @property
    def num_channels(self) -> int:
        return self.nu_e.shape[1]

    def astype(self, dtype) -> "SmoeParams":
        def cast(x):
            return None if x is None else x.astype(dtype)
        return SmoeParams(*(cast(getattr(self, f)) for f in self.FIELDS))

    def to_numpy(self) -> "SmoeParams":
        def conv(x):
            return None if x is None else np.asarray(x)
        return SmoeParams(*(conv(getattr(self, f)) for f in self.FIELDS))


def assemble_A(params: SmoeParams, cfg: SmoeConfig) -> jnp.ndarray:
    """Build the (K, d, d) steering factor from diag + corr parts.

    Mirrors reference smoe.py:714-736:
      * radial: A = a * I per kernel (a_diag is (K,))
      * else:   A = diag(a_diag) + strict_lower(a_corr)
      * train_inverse_cov additionally symmetrizes:
                A = diag + strict_lower + strict_lower^T
    """
    d = cfg.dim_domain
    if cfg.radial_as:
        eye = jnp.eye(d, dtype=params.a_diag.dtype)
        return params.a_diag[:, None, None] * eye[None]
    diag_entries = jnp.diagonal(params.a_diag, axis1=1, axis2=2)          # (K, d)
    A = jnp.einsum("ki,ij->kij", diag_entries, jnp.eye(d, dtype=params.a_diag.dtype))
    strict_lower = jnp.tril(params.a_corr, k=-1)
    A = A + strict_lower
    if cfg.train_inverse_cov:
        A = A + jnp.swapaxes(strict_lower, 1, 2)
    return A


def diag_of_A(params: SmoeParams, cfg: SmoeConfig) -> jnp.ndarray:
    """(K, d) diagonal of the assembled A (used by determinant + u_l1 reg)."""
    if cfg.radial_as:
        return jnp.broadcast_to(params.a_diag[:, None],
                                (params.capacity, cfg.dim_domain))
    return jnp.diagonal(params.a_diag, axis1=1, axis2=2)


def init_motion_identity(num_frames: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity global-motion params, shape (8, F): h11,h12,h13,h21,h22,h23,h31,h32.

    Reference initializes h11=h22=1, rest 0 (smoe.py:577-586).
    """
    m = np.zeros((8, num_frames), dtype=np.float32)
    m[0] = 1.0  # h11
    m[4] = 1.0  # h22
    return jnp.asarray(m, dtype=dtype)
