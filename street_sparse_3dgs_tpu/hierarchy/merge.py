"""Multi-chunk hierarchy consolidation — the GaussianHierarchyMerger
equivalent.

The reference Merger is a missing C++ CLI that consolidates per-chunk
optimized hierarchies (``.hier_opt``) into one ``merged.hier``
(``scripts/full_train.py:259-282``).  Here: per-chunk trees are re-rooted
under pairwise-merged super-nodes, indices are remapped by offset, the skybox
tail is taken from the first chunk (chunks share the scaffold skybox —
keeping one copy is the dedupe the reference needs too), and anchor masks are
concatenated.  Super-node children are not index-contiguous; that is fine
because cut selection (``structure.select_cut``) is parent-pointer based and
never walks child ranges.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.gaussians import GaussianParams
from .build import _covariances, _merge_pairs, _rotmat_to_quat
from .structure import Hierarchy


def merge_hierarchies(chunks: list[Hierarchy]) -> Hierarchy:
    if len(chunks) == 1:
        return chunks[0]

    # Strip skybox tails; remember the first chunk's.
    sky = None
    node_params, parents, cstarts, ccounts = [], [], [], []
    centers, halves, sizes, anchors = [], [], [], []
    roots = []
    offset = 0
    for ci, h in enumerate(chunks):
        n = h.n_nodes
        p = GaussianParams(*(np.asarray(x)[:n] for x in h.params))
        if ci == 0 and h.skybox_count > 0:
            sky = GaussianParams(
                *(np.asarray(x)[n:] for x in h.params))
        par = np.asarray(h.parent).copy()
        root_local = int(np.nonzero(par < 0)[0][0])
        roots.append(offset + root_local)
        par = np.where(par >= 0, par + offset, -1)
        node_params.append(p)
        parents.append(par)
        cstarts.append(np.asarray(h.child_start) + offset)
        ccounts.append(np.asarray(h.child_count))
        centers.append(np.asarray(h.box_center))
        halves.append(np.asarray(h.box_half))
        sizes.append(np.asarray(h.size))
        anchors.append(np.asarray(h.anchors))
        offset += n

    params = GaussianParams(*(np.concatenate(leaves, 0)
                              for leaves in zip(*node_params)))
    parent = np.concatenate(parents)
    child_start = np.concatenate(cstarts)
    child_count = np.concatenate(ccounts)
    box_center = np.concatenate(centers)
    box_half = np.concatenate(halves)
    size = np.concatenate(sizes)
    anchor = np.concatenate(anchors)

    # Chain-merge chunk roots pairwise into super-nodes until one root
    # remains (keeps the binary-sibling invariant of the builder).
    cur = list(roots)
    while len(cur) > 1:
        nxt = []
        i = 0
        while i < len(cur):
            if i + 1 < len(cur):
                a, b = cur[i], cur[i + 1]
                xyz = params.xyz[[a, b]]
                scales = np.exp(params.log_scales[[a, b]])
                quats = params.quats[[a, b]]
                sh = np.concatenate([params.features_dc[[a, b]],
                                     params.features_rest[[a, b]]], axis=1)
                opac = np.abs(params.opacity_raw[[a, b], 0])
                cov = _covariances(scales, quats)
                w = opac * np.sqrt(np.maximum(np.linalg.det(cov), 1e-12))
                mu, cv, sh_p, o_p, _, _ = _merge_pairs(xyz, cov, sh, opac, w)
                evals, evecs = np.linalg.eigh(cv)
                evals = np.maximum(evals, 1e-10)
                det = np.linalg.det(evecs)
                evecs[:, :, 0] *= np.where(det < 0, -1.0, 1.0)[:, None]
                new_id = params.xyz.shape[0]
                params = GaussianParams(
                    xyz=np.concatenate([params.xyz, mu]),
                    features_dc=np.concatenate(
                        [params.features_dc, sh_p[:, :1]]),
                    features_rest=np.concatenate(
                        [params.features_rest, sh_p[:, 1:]]),
                    log_scales=np.concatenate(
                        [params.log_scales,
                         np.log(np.sqrt(evals))]),
                    quats=np.concatenate([params.quats,
                                          _rotmat_to_quat(evecs)]),
                    opacity_raw=np.concatenate(
                        [params.opacity_raw,
                         np.clip(o_p, 1e-5, 1 - 1e-5)[:, None]]),
                )
                parent = np.concatenate([parent, [-1]])
                parent[a] = new_id
                parent[b] = new_id
                # Sibling contiguity does not hold for super-nodes; the cut
                # never reads child_start of interior nodes (selection is
                # parent-pointer based), so store the pair loosely.
                child_start = np.concatenate([child_start, [a]])
                child_count = np.concatenate([child_count, [2]])
                lo = np.minimum(box_center[a] - box_half[a],
                                box_center[b] - box_half[b])
                hi = np.maximum(box_center[a] + box_half[a],
                                box_center[b] + box_half[b])
                box_center = np.concatenate([box_center, [(lo + hi) / 2]])
                box_half = np.concatenate([box_half, [(hi - lo) / 2]])
                size = np.concatenate([size, [np.max(hi - lo)]])
                anchor = np.concatenate([anchor, [False]])
                nxt.append(new_id)
                i += 2
            else:
                nxt.append(cur[i])
                i += 1
        cur = nxt

    n_nodes = params.xyz.shape[0]
    if sky is not None:
        params = GaussianParams(*(np.concatenate([a, b], 0)
                                  for a, b in zip(params, sky)))
        skybox_count = sky.xyz.shape[0]
    else:
        skybox_count = 0

    return Hierarchy(
        params=GaussianParams(*(jnp.asarray(x, jnp.float32)
                                for x in params)),
        parent=jnp.asarray(parent, jnp.int32),
        child_start=jnp.asarray(child_start, jnp.int32),
        child_count=jnp.asarray(child_count, jnp.int32),
        box_center=jnp.asarray(box_center, jnp.float32),
        box_half=jnp.asarray(box_half, jnp.float32),
        size=jnp.asarray(size, jnp.float32),
        anchors=jnp.asarray(anchor, bool),
        skybox_count=skybox_count,
    )
