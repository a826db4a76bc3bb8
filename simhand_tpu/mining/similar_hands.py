"""Similar-hand mining: sharded on-device top-k pose search.

The reference ships only precomputed pairing JSONs (SURVEY.md §2.1 — the
mining itself is absent from the repo; the paper §3 defines the metric as
MPJPE over detected 2D keypoints, restricted to hands from *other*
videos). This module implements it as a TPU job:

  * the 2M x 21 x 2 keypoint corpus lives in HBM once (~340 MB f32);
  * queries are sharded over the "data" mesh axis;
  * each device streams database chunks through a fused
    distance-computation + running-top-k `lax.scan` — peak memory is one
    (q_chunk, db_chunk) plane, compute is VPU-bound per-joint
    accumulation;
  * same-video candidates (and self) are masked to +inf.

Output plugs straight into the Hand100M v1-1 annotation schema
(``positive_sample`` / ``distance`` fields).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _chunk_distances(q: Array, db: Array) -> Array:
    """(Q, 21, 2) x (C, 21, 2) -> (Q, C) MPJPE matrix, joint-tiled."""
    Q, C = q.shape[0], db.shape[0]

    def body(j, acc):
        dx = q[:, j, 0][:, None] - db[:, j, 0][None, :]
        dy = q[:, j, 1][:, None] - db[:, j, 1][None, :]
        return acc + jnp.sqrt(dx * dx + dy * dy)

    acc = jax.lax.fori_loop(0, q.shape[1], body, jnp.zeros((Q, C), q.dtype))
    return acc / q.shape[1]


@partial(jax.jit, static_argnames=("k", "db_chunk"))
def topk_similar(
    queries: Array,          # (Q, 21, 2)
    query_vids: Array,       # (Q,) int32 video ids
    query_ids: Array,        # (Q,) int32 global indices (for self-mask)
    db: Array,               # (N, 21, 2)
    db_vids: Array,          # (N,) int32
    k: int = 1,
    db_chunk: int = 8192,
):
    """Top-k most-similar other-video hands for each query.

    Returns (distances (Q, k), db_indices (Q, k)).
    """
    Q = queries.shape[0]
    N = db.shape[0]
    pad = (-N) % db_chunk
    if pad:
        db = jnp.concatenate([db, jnp.full((pad,) + db.shape[1:], 1e9, db.dtype)])
        db_vids = jnp.concatenate([db_vids, jnp.full((pad,), -2, db_vids.dtype)])
    n_chunks = db.shape[0] // db_chunk

    db = db.reshape(n_chunks, db_chunk, *db.shape[1:])
    db_vids_c = db_vids.reshape(n_chunks, db_chunk)

    init = (
        jnp.full((Q, k), jnp.inf, queries.dtype),
        jnp.full((Q, k), -1, jnp.int32),
    )

    def scan_body(carry, inputs):
        best_d, best_i = carry
        chunk_idx, chunk, vids = inputs
        d = _chunk_distances(queries, chunk)                     # (Q, C)
        col_ids = chunk_idx * db_chunk + jnp.arange(db_chunk)[None, :]
        same_video = query_vids[:, None] == vids[None, :]
        is_self = query_ids[:, None] == col_ids
        # pad columns carry finite (~1e9-scale) distances and a -2 vid
        # that never matches — mask them explicitly or a query with no
        # valid cross-video candidate would select a pad index >= N
        is_pad = col_ids >= N
        d = jnp.where(same_video | is_self | is_pad, jnp.inf, d)
        # merge with running best: top-k of the concatenation.
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(col_ids, d.shape).astype(jnp.int32)], axis=1
        )
        neg_top, pos = jax.lax.top_k(-cat_d, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (-neg_top, new_i), None

    (best_d, best_i), _ = jax.lax.scan(
        scan_body,
        init,
        (jnp.arange(n_chunks), db, db_vids_c),
    )
    return best_d, best_i


def _topk_all_queries(
    q_kp: Array,      # (Q, 21, 2), Q a multiple of query_chunk
    q_vids: Array,    # (Q,)
    q_ids: Array,     # (Q,) global indices
    db: Array,        # (N, 21, 2)
    db_vids: Array,   # (N,)
    k: int,
    query_chunk: int,
    db_chunk: int,
):
    """Streams all query chunks against the database inside one program
    (a lax.scan over query chunks wrapping the streaming top-k)."""
    Q = q_kp.shape[0]
    n_q = Q // query_chunk
    qs = q_kp.reshape(n_q, query_chunk, *q_kp.shape[1:])
    vs = q_vids.reshape(n_q, query_chunk)
    ids = q_ids.reshape(n_q, query_chunk)

    def body(_, inputs):
        q, qv, qi = inputs
        d, i = topk_similar(q, qv, qi, db, db_vids, k=k, db_chunk=db_chunk)
        return None, (d, i)

    _, (d, i) = jax.lax.scan(body, None, (qs, vs, ids))
    return d.reshape(Q, k), i.reshape(Q, k)


@partial(jax.jit, static_argnames=("k", "query_chunk", "db_chunk"))
def topk_similar_all(
    kp: Array,        # (Q, 21, 2), Q padded to a multiple of query_chunk
    vids: Array,      # (Q,)
    db: Array,        # (N, 21, 2) — the UNPADDED corpus
    db_vids: Array,   # (N,)
    k: int = 1,
    query_chunk: int = 8192,
    db_chunk: int = 8192,
):
    """Whole-corpus mining in ONE device program: a lax.scan over query
    chunks wraps the streaming top-k, so the host syncs exactly once
    (per-chunk host dispatch was 99% of wall time over a remote tunnel).

    The db is passed separately from the (possibly padded) queries so
    query padding never enters the candidate set — zero-keypoint pad
    rows have small finite MPJPE to real hands and would otherwise be
    minable as bogus positives.
    """
    q_ids = jnp.arange(kp.shape[0], dtype=jnp.int32)
    return _topk_all_queries(
        kp, vids, q_ids, db, db_vids, k=k, query_chunk=query_chunk,
        db_chunk=db_chunk,
    )


def make_sharded_topk_all(mesh, k: int, query_chunk: int, db_chunk: int,
                          axis_name: str = "data"):
    """Mesh-sharded whole-corpus mining, still ONE program + ONE fetch:
    queries (and their video/global ids) are sharded over ``axis_name``,
    the keypoint database is replicated in every device's HBM (340 MB f32
    at the 2M-corpus scale — fits), and each device scans only its query
    shard. This is the BASELINE north-star shape: a sharded device-side
    top-k pairing job.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(q_kp, q_vids, q_ids, db, db_vids):
        return _topk_all_queries(
            q_kp, q_vids, q_ids, db, db_vids,
            k=k, query_chunk=query_chunk, db_chunk=db_chunk,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P()),
            out_specs=(P(axis_name), P(axis_name)),
            check_vma=False,
        )
    )


def _merge_block(q, qv, qi, blk, blk_vids, blk_ids, best_d, best_i,
                 k: int, db_chunk: int):
    """Merges one database block (with EXPLICIT global ids) into the
    running per-query top-k. The block is streamed in ``db_chunk`` tiles
    like ``topk_similar``; pad rows carry id -1 and are masked."""
    nc = blk.shape[0] // db_chunk
    blk_c = blk.reshape(nc, db_chunk, *blk.shape[1:])
    vids_c = blk_vids.reshape(nc, db_chunk)
    ids_c = blk_ids.reshape(nc, db_chunk)

    def body(carry, inputs):
        bd, bi = carry
        chunk, cv, ci = inputs
        d = _chunk_distances(q, chunk)                       # (Q, C)
        mask = (
            (qv[:, None] == cv[None, :])
            | (qi[:, None] == ci[None, :])
            | (ci[None, :] < 0)
        )
        d = jnp.where(mask, jnp.inf, d)
        cat_d = jnp.concatenate([bd, d], axis=1)
        cat_i = jnp.concatenate(
            [bi, jnp.broadcast_to(ci[None, :], d.shape).astype(jnp.int32)],
            axis=1,
        )
        neg_top, pos = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, pos, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(
        body, (best_d, best_i), (blk_c, vids_c, ids_c)
    )
    return best_d, best_i


def make_ring_topk_all(mesh, k: int, query_chunk: int, db_chunk: int,
                       axis_name: str = "data"):
    """DB-SHARDED whole-corpus mining: queries AND the keypoint database
    are sharded over ``axis_name``; each round every device merges its
    query shard against the database block it currently holds, then the
    blocks rotate one hop around the ICI ring (``lax.ppermute``). After
    ``n_devices`` rounds every query has seen the whole corpus.

    This removes the replicated-DB HBM floor of ``make_sharded_topk_all``
    (340 MB at 2M hands — fine; ~17 GB at the 100M-crop scale the
    Hand100M corpus name implies — not): per-device DB memory is N/n
    rows, and the rotation is a neighbor exchange that overlaps with the
    distance compute. Same masking semantics (cross-video only, self and
    pads excluded); still ONE program, ONE host fetch.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local(q_kp, q_vids, q_ids, db_blk, db_vids_blk, db_ids_blk):
        q_loc = q_kp.shape[0]
        n_q = q_loc // query_chunk
        qs = q_kp.reshape(n_q, query_chunk, *q_kp.shape[1:])
        vs = q_vids.reshape(n_q, query_chunk)
        ids = q_ids.reshape(n_q, query_chunk)
        best_d = jnp.full((n_q, query_chunk, k), jnp.inf, q_kp.dtype)
        best_i = jnp.full((n_q, query_chunk, k), -1, jnp.int32)

        def round_body(_, carry):
            best_d, best_i, blk, bv, bids = carry

            def per_q(carry2, inputs):
                q, qv, qi, bd, bi = inputs
                bd, bi = _merge_block(
                    q, qv, qi, blk, bv, bids, bd, bi, k, db_chunk
                )
                return carry2, (bd, bi)

            _, (best_d, best_i) = jax.lax.scan(
                per_q, None, (qs, vs, ids, best_d, best_i)
            )
            blk = jax.lax.ppermute(blk, axis_name, perm)
            bv = jax.lax.ppermute(bv, axis_name, perm)
            bids = jax.lax.ppermute(bids, axis_name, perm)
            return best_d, best_i, blk, bv, bids

        best_d, best_i, *_ = jax.lax.fori_loop(
            0, n_dev, round_body,
            (best_d, best_i, db_blk, db_vids_blk, db_ids_blk),
        )
        return (best_d.reshape(q_loc, k), best_i.reshape(q_loc, k))

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name),) * 6,
            out_specs=(P(axis_name), P(axis_name)),
            check_vma=False,
        )
    )


def mine_similar_hands(
    keypoints: np.ndarray,    # (N, 21, 2) normalized 2D keypoints
    video_ids: np.ndarray,    # (N,) int
    k: int = 1,
    query_chunk: int = 4096,
    db_chunk: int = 8192,
    mesh=None,
    progress: bool = False,
    single_program: bool | None = None,
    shard_db: bool = False,
):
    """Full-corpus mining: every hand paired with its k most-similar hands
    from other videos.

    With a mesh, query chunks are sharded over the "data" axis (the
    database is replicated in each device's HBM). Returns
    (distances (N, k), indices (N, k)) as numpy arrays.
    """
    N = keypoints.shape[0]
    kp = jnp.asarray(keypoints, jnp.float32)
    vids = jnp.asarray(video_ids, jnp.int32)

    if shard_db:
        # ring variant: DB sharded too (see make_ring_topk_all). Queries
        # pad to query_chunk*n_dev; the DB pads to db_chunk*n_dev so each
        # device holds whole tiles (pad rows id=-1, masked in-kernel).
        if mesh is None:
            raise ValueError("shard_db=True requires a mesh")
        n_dev = mesh.devices.size
        qpad = (-N) % (query_chunk * n_dev)
        kp_q = kp if not qpad else jnp.concatenate(
            [kp, jnp.zeros((qpad, 21, 2), kp.dtype)])
        vids_q = vids if not qpad else jnp.concatenate(
            [vids, jnp.full((qpad,), -3, vids.dtype)])
        q_ids = jnp.arange(kp_q.shape[0], dtype=jnp.int32)
        dpad = (-N) % (db_chunk * n_dev)
        db = kp if not dpad else jnp.concatenate(
            [kp, jnp.zeros((dpad, 21, 2), kp.dtype)])
        db_vids = vids if not dpad else jnp.concatenate(
            [vids, jnp.full((dpad,), -2, vids.dtype)])
        db_ids = jnp.concatenate(
            [jnp.arange(N, dtype=jnp.int32),
             jnp.full((dpad,), -1, jnp.int32)]) if dpad else jnp.arange(
                 N, dtype=jnp.int32)
        fn = make_ring_topk_all(mesh, k, query_chunk, db_chunk)
        d, i = fn(kp_q, vids_q, q_ids, db, db_vids, db_ids)
        return np.asarray(d[:N]), np.asarray(i[:N])

    if single_program is None:
        single_program = True
    if single_program:
        # one fused program, one host round trip
        n_dev = 1 if mesh is None else mesh.devices.size
        pad = (-N) % (query_chunk * n_dev)
        kp_p = kp
        vids_p = vids
        if pad:
            kp_p = jnp.concatenate([kp, jnp.zeros((pad, 21, 2), kp.dtype)])
            vids_p = jnp.concatenate([vids, jnp.full((pad,), -3, vids.dtype)])
        if mesh is None:
            d, i = topk_similar_all(
                kp_p, vids_p, kp, vids,
                k=k, query_chunk=query_chunk, db_chunk=db_chunk,
            )
        else:
            fn = make_sharded_topk_all(mesh, k, query_chunk, db_chunk)
            ids = jnp.arange(kp_p.shape[0], dtype=jnp.int32)
            d, i = fn(kp_p, vids_p, ids, kp, vids)
        return np.asarray(d[:N]), np.asarray(i[:N])

    fn = topk_similar
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        fn = jax.jit(
            shard_map(
                partial(topk_similar, k=k, db_chunk=db_chunk),
                mesh=mesh,
                in_specs=(P("data"), P("data"), P("data"), P(), P()),
                out_specs=(P("data"), P("data")),
                check_vma=False,
            )
        )

    # Dispatch every query chunk asynchronously (chunks are independent;
    # per-chunk host fetches would serialize on the device round trip —
    # ~99% of wall time over a remote tunnel), fetch once at the end.
    pending = []
    n_dev = 1 if mesh is None else mesh.devices.size
    step = query_chunk * n_dev
    for start in range(0, N, step):
        stop = min(start + step, N)
        q = kp[start:stop]
        qv = vids[start:stop]
        qi = jnp.arange(start, stop, dtype=jnp.int32)
        # pad to the full step so every dispatch shares one compiled shape
        pad = step - q.shape[0]
        if pad:
            q = jnp.concatenate([q, jnp.zeros((pad, 21, 2), q.dtype)])
            qv = jnp.concatenate([qv, jnp.full((pad,), -3, qv.dtype)])
            qi = jnp.concatenate([qi, jnp.full((pad,), -3, qi.dtype)])
        if mesh is None:
            d, i = topk_similar(q, qv, qi, kp, vids, k=k, db_chunk=db_chunk)
        else:
            d, i = fn(q, qv, qi, kp, vids)
        pending.append((d, i, pad))
        if progress:
            print(f"dispatched {stop}/{N}", flush=True)
    all_d, all_i = [], []
    for d, i, pad in pending:
        d, i = np.asarray(d), np.asarray(i)
        if pad:
            d, i = d[:-pad], i[:-pad]
        all_d.append(d)
        all_i.append(i)
    return np.concatenate(all_d), np.concatenate(all_i)


def attach_positives(annotations: list[dict], distances: np.ndarray,
                     indices: np.ndarray) -> list[dict]:
    """Writes mining results into annotation dicts (v1-1 schema fields).

    Raises on the -1 no-candidate sentinel (a query whose every candidate
    shares its video — e.g. k too large or a single-video corpus) rather
    than silently wrapping to the last annotation."""
    for n, (a, d_row, i_row) in enumerate(zip(annotations, distances,
                                              indices)):
        if (np.asarray(i_row) < 0).any():
            raise ValueError(
                f"annotation #{n} (hand_id {a.get('hand_id')}): no valid "
                "cross-video candidate for at least one of its top-k "
                "slots — shrink k or check the corpus has >1 video"
            )
        a["positive_sample"] = [int(annotations[j]["hand_id"]) for j in i_row]
        a["distance"] = [float(x) for x in d_row]
    return annotations
