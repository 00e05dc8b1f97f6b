"""Device mesh + sharding layout for SPMD SLAM (SURVEY.md §2.3).

The reference is single-threaded; scaling here is new capability. The
natural SPMD axis of this workload is the *landmark* axis: projections,
patch warps, NCC search, and innovation columns are independent per
landmark (the engine's batched replacements for SLAM.cpp:1634-1682,
1804-1906, 1960-1984). The landmark table shards along M; the state vector
and sqrt factor stay replicated (their QRs are the sync points); images are
replicated. XLA GSPMD inserts the all-gathers where per-landmark results
meet the replicated QR.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SlamConfig
from ..filter.state import FilterState, LandmarkTable, StoredTable


MAP_AXIS = "map"


def replicate_hint(x):
    """Constrain ``x`` to be replicated when compiling under a mesh.

    Library code can't name the mesh; under ``jax.sharding.set_mesh`` the
    abstract mesh is visible in-trace and a bare PartitionSpec() constraint
    replicates. Outside any mesh this is a no-op. Used to stop GSPMD from
    propagating the landmark-axis sharding onto small K-sized scatter
    values (degenerate shardings there force involuntary full
    rematerialization)."""
    import jax
    from jax.sharding import PartitionSpec

    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty:
        return x
    return jax.lax.with_sharding_constraint(x, PartitionSpec())


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (MAP_AXIS,))


def state_shardings(mesh: Mesh, cfg: SlamConfig,
                    shard_sqrt: bool = False) -> FilterState:
    """Sharding pytree matching FilterState.

    Default layout (front-end scaling): landmark table sharded on M (the
    per-landmark projection / warp / NCC work), state vector / sqrt factor
    / stored table replicated. Requires M % n_devices == 0.

    ``shard_sqrt=True`` (large-state scaling, SURVEY §2.3 "SPMD sharding of
    map blocks"): the sqrt factor S — the dominant object at large M, with
    D = 6M+4 — is sharded along its ROW axis instead, and the landmark
    table is replicated (at M=512 the table is ~1 MB vs 37 MB for S). Every
    Gram in the qr_mode="gram" sqrt paths contracts over S's rows
    (motion/integration/deletion: G = c*(S^T S) + thin corrections, update:
    Pyy/Pxy from row-contractions), so GSPMD turns each into
    psum-of-local-Grams over ICI — the Schur-reduction pattern — with only
    the D x D Cholesky replicated. Requires D % n_devices == 0
    (M ≡ 2 mod 4 gives D % 8 == 0). The two layouts are mutually
    exclusive because M and 6M+4 are never both divisible by n >= 8.
    """
    rep = NamedSharding(mesh, P())
    if shard_sqrt:
        n = mesh.devices.size
        if cfg.state_dim % n:
            raise ValueError(
                f"shard_sqrt layout needs state_dim {cfg.state_dim} "
                f"divisible by {n} devices (pick max_landmarks ≡ 2 mod 4 "
                f"for 8 devices)")
        import dataclasses

        import jax.tree_util as jtu

        sh = jtu.tree_map(lambda _: rep, state_shardings(mesh, cfg))
        return dataclasses.replace(
            sh, S=NamedSharding(mesh, P(MAP_AXIS, None)))
    shard0 = NamedSharding(mesh, P(MAP_AXIS))

    def lm_shard(ndim):
        return NamedSharding(mesh, P(*((MAP_AXIS,) + (None,) * (ndim - 1))))

    lm = LandmarkTable(
        active=shard0, lid=shard0, is_loop=shard0, n_predict=shard0,
        n_match=shard0, visible=shard0, matched=shard0,
        pred=lm_shard(2), match_px=lm_shard(2), si=lm_shard(3),
        init_pixel=lm_shard(2), init_trans=lm_shard(2), init_theta=shard0,
        init_patch=lm_shard(3), match_patch=lm_shard(3), xyz=lm_shard(2),
    )
    stored = StoredTable(
        valid=rep, stamp=rep, seq=rep, lid=rep, is_loop=rep, n_predict=rep,
        n_match=rep, state=rep, sr=rep, init_pixel=rep, init_trans=rep,
        init_theta=rep, init_patch=rep, xyz=rep,
    )
    return FilterState(x=rep, S=rep, lm=lm, stored=stored, next_id=rep,
                       frame=rep, n_repairs=rep, n_escalations=rep,
                       n_skipped=rep)
