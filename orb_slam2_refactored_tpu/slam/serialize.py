"""Map checkpoint / resume: save and load the full SLAM state.

The reference leaves `SaveMap/LoadMap` as TODOs
(`/root/reference/include/System.h:99-101`, `src/System.cc:845-847`); here
map serialization is first-class (SURVEY.md §5): the SoA device arrays dump
to one compressed npz, the sparse graph (observations, covisibility,
spanning tree, loop edges) flattens to index triplets via the backend-neutral
accessor interface, so python and native graph backends round-trip
identically.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .map_state import MapArrays
from .tracking import Tracker, TrackState


def save_map(tracker: Tracker, path: str):
    # complete the in-flight mapping job + deferred erasures so the saved
    # graph matches the saved device arrays
    tracker._finalize_map()
    # a checkpoint without place-recognition state could never be
    # relocalized into — train/build the BoW index now if the session was
    # too short for the lazy trainer (see Tracker.force_bow_index)
    tracker.force_bow_index()
    m = tracker.map
    g = tracker.graph
    arrays = {f"map_{k}": np.asarray(v) for k, v in m._asdict().items()}

    obs = []
    for pt in g.points_with_obs():
        for kf, feat in g.obs_pairs(pt):
            obs.append((pt, kf, feat))
    obs = np.asarray(obs, np.int64).reshape(-1, 3)

    alive_kfs = g.alive_kfs()
    covis = []
    for a in alive_kfs:
        for b in g.covis_neighbors(int(a)):
            if b > a:
                w = (g.covis_w(int(a), int(b))
                     if hasattr(g, "covis_w") else g.covis_weight(int(a), int(b)))
                covis.append((a, b, w))
    covis = np.asarray(covis, np.int64).reshape(-1, 3)

    parent = np.asarray(
        [g.parent[k] for k in range(g.cap.max_keyframes)], np.int64
    )
    loops = []
    for a in alive_kfs:
        for b in g.loop_edges.get(int(a), set()):
            if b > a:
                loops.append((a, b))
    loops = np.asarray(loops, np.int64).reshape(-1, 2)

    pt_alive = np.zeros(g.cap.max_points, bool)
    for p in g.alive_points():
        pt_alive[p] = True
    pt_first = np.asarray(
        [g.pt_first_kf[p] for p in np.nonzero(pt_alive)[0]], np.int64
    )
    pt_first_idx = np.nonzero(pt_alive)[0]

    # place-recognition state: vocabulary + per-KF BoW rows, so a loaded map
    # can relocalize immediately (the reference reloads ORBvoc.txt at startup;
    # our vocabulary is live-trained, so it must travel with the map)
    voc_arrays = {}
    lc = tracker.loop_closer
    if lc is not None:
        voc_arrays = {
            "voc_words": np.asarray(lc.db.voc.words),
            "voc_idf": np.asarray(lc.db.voc.idf),
            "voc_bow_ids": np.asarray(lc.db.bow_ids),  # sparse rows
            "voc_bow_cnt": np.asarray(lc.db.bow_cnt),
            "voc_db_idf": np.asarray(lc.db.idf),  # live-refit idf state
            "voc_active": lc.db.active,
            "voc_fix_scale": np.int64(lc.fix_scale),
        }

    np.savez_compressed(
        path,
        **arrays,
        **voc_arrays,
        graph_obs=obs,
        graph_covis=covis,
        graph_parent=parent,
        graph_loops=loops,
        graph_kf_alive=g.kf_alive,
        graph_kf_frame_id=g.kf_frame_id,
        graph_kf_timestamp=g.kf_timestamp,
        graph_pt_alive=pt_alive,
        graph_pt_first_idx=pt_first_idx,
        graph_pt_first_val=pt_first,
        graph_origin=np.int64(g.origin_kf),
        graph_num_kfs=np.int64(g.num_kfs),
        graph_next_kf_slot=np.int64(g.next_kf_slot),
        graph_kf_seq=np.asarray(g.kf_seq, np.int64),
        graph_kf_quarantine=np.asarray(
            [(k, st) for k, st in g.kf_quarantine], np.int64
        ).reshape(-1, 2),
        # young-point trial windows + point-slot quarantine: without these a
        # loaded map would skip min-obs culling for in-trial points and lose
        # slot-recycling aging state (ADVICE r3)
        graph_young_pts=np.asarray(
            [(p, sq) for p, sq in g.young_pts], np.int64
        ).reshape(-1, 2),
        graph_pt_quarantine=np.asarray(
            [(p, st) for p, st in g.pt_quarantine], np.int64
        ).reshape(-1, 2),
        graph_next_point=np.int64(g.next_point),
        graph_watermark=np.asarray(g.kf_watermark, np.int64),
        tracker_pose=tracker.pose,
        tracker_state=np.int64(tracker.state),
        tracker_ref_kf=np.int64(tracker.ref_kf),
    )


def load_map(tracker: Tracker, path: str):
    """Restore a saved map into a freshly-constructed Tracker (same config).

    Returns the tracker, relocalization-ready (state LOST so the next frame
    relocalizes against the loaded map, or OK if it was saved tracking and
    the caller resumes the same sequence)."""
    z = np.load(path, allow_pickle=False)
    m = MapArrays(**{
        k[len("map_"):]: jnp.asarray(z[k]) for k in z.files if k.startswith("map_")
    })
    tracker.map = m
    g = tracker.graph
    g.num_kfs = int(z["graph_num_kfs"])
    g.next_kf_slot = int(z["graph_next_kf_slot"]) if "graph_next_kf_slot" in z.files else g.num_kfs
    if "graph_kf_seq" in z.files:
        g.kf_seq[:] = z["graph_kf_seq"]
    else:  # legacy checkpoint: slots were allocated monotonically
        g.kf_seq[: g.num_kfs] = np.arange(g.num_kfs)
    if "graph_kf_quarantine" in z.files:
        g.kf_quarantine = [(int(a), int(b)) for a, b in z["graph_kf_quarantine"]]
    if "graph_young_pts" in z.files:
        g.young_pts = [(int(p), int(sq)) for p, sq in z["graph_young_pts"]]
    if "graph_pt_quarantine" in z.files:
        g.pt_quarantine = [(int(p), int(st))
                           for p, st in z["graph_pt_quarantine"]]
    g.next_point = int(z["graph_next_point"])
    g.origin_kf = int(z["graph_origin"])
    if "graph_watermark" in z.files:
        g.kf_watermark[:] = z["graph_watermark"]
    kf_alive = z["graph_kf_alive"]
    for k in np.nonzero(kf_alive)[0]:
        g.set_kf_alive(int(k), True)
    g.kf_frame_id[:] = z["graph_kf_frame_id"]
    g.kf_timestamp[:] = z["graph_kf_timestamp"]
    for p in np.nonzero(z["graph_pt_alive"])[0]:
        g.pt_alive[int(p)] = True
    for p, v in zip(z["graph_pt_first_idx"], z["graph_pt_first_val"]):
        g.pt_first_kf[int(p)] = int(v)
    for pt, kf, feat in z["graph_obs"]:
        g.add_observation(int(pt), int(kf), int(feat), False)
    # covisibility rebuilds exactly from stored rows via update_connections
    kf_mp = np.asarray(m.kf_mp)
    for k in np.nonzero(kf_alive)[0]:
        g.update_connections(int(k), kf_mp[k], obs_for_new=False)
    for k, p in enumerate(z["graph_parent"]):
        if p >= 0:
            g.parent[int(k)] = int(p)
            # the python backend's children sets don't auto-populate from
            # parent writes (the native backend's mg_set_parent does);
            # KF-culling re-parenting needs them
            if isinstance(getattr(g, "children", None), dict):
                g.children.setdefault(int(p), set()).add(int(k))
    for a, b in z["graph_loops"]:
        g.loop_edges.setdefault(int(a), set()).add(int(b))
        g.loop_edges.setdefault(int(b), set()).add(int(a))

    # restore place recognition: vocabulary + BoW rows -> a ready LoopCloser,
    # so the promised "relocalization-ready" contract actually holds (reloc
    # needs loop_closer.db; lazy creation only happens at keyframe insertion)
    if "voc_words" in z.files:
        from ..geometry import projection as proj
        from .loop_closing import LoopCloser
        from .vocabulary import Vocabulary

        voc = Vocabulary(words=jnp.asarray(z["voc_words"]),
                         idf=jnp.asarray(z["voc_idf"]))
        tracker.vocabulary = voc
        lc = LoopCloser(
            voc, tracker.cam, tracker.cfg.map_capacity.max_keyframes,
            tracker.cfg.n_levels, tracker.cfg.scale_factor,
            fix_scale=bool(z["voc_fix_scale"]),
        )
        if "voc_bow_ids" in z.files:  # sparse rows (current format)
            lc.db.bow_ids = jnp.asarray(z["voc_bow_ids"])
            lc.db.bow_cnt = jnp.asarray(z["voc_bow_cnt"])
        else:  # legacy dense [KF, W] checkpoint: convert to sparse rows
            dense = np.asarray(z["voc_bow"])
            T = lc.db.row_capacity
            W = dense.shape[1]
            ids = np.argsort(-dense, axis=1)[:, :T].astype(np.int32)
            cnt = np.take_along_axis(dense, ids, axis=1).astype(np.float32)
            ids[cnt <= 0] = W
            cnt[cnt <= 0] = 0.0
            lc.db.bow_ids = jnp.asarray(ids)
            lc.db.bow_cnt = jnp.asarray(cnt)
        lc.db.active = z["voc_active"].copy()
        if "voc_db_idf" in z.files:
            lc.db.idf = jnp.asarray(z["voc_db_idf"])
        tracker.loop_closer = lc

    tracker.pose = z["tracker_pose"]
    tracker.pose_dev = jnp.asarray(tracker.pose)
    tracker.ref_kf = int(z["tracker_ref_kf"])
    tracker.ref_kf_tracked = 1
    tracker._ref_mp_row = kf_mp[tracker.ref_kf] if tracker.ref_kf >= 0 else None
    # resume in LOST: the first tracked frame relocalizes against the map
    tracker.state = (
        TrackState.LOST if int(z["tracker_state"]) != TrackState.NOT_INITIALIZED
        else TrackState.NOT_INITIALIZED
    )
    return tracker
