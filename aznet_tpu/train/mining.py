"""Search-driven hard-region mining for AZ training.

The reference trains the AZ heads on anchor regions from a static division
tree + jittered gt (SURVEY.md §2.1 "AZ training" [M]); round-2 analysis
showed misses concentrating on regions the *test-time search* visits but
the static sampler never covers. This module periodically runs the actual
on-device zoom search (``az_search(collect_frontier=True)``) with the
CURRENT parameters over training images and caches the visited frontier
regions; the minibatch sampler mixes them into the anchor pool, aligning
the training distribution with the inference distribution (the same idea
as hard-example mining, driven by the model's own search tree).

Pipeline discipline: harvesting is ONE batched device call every
``TRAIN.MINE_INTERVAL`` steps from the training loop; the cache is plain
host NumPy so the prefetcher never touches device arrays (DESIGN.md
finding 9).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from aznet_tpu.config import Config


def make_harvest_fn(model, cfg: Config, canvas_hw):
    """Jittable ``(params, images [B,Hp,Wp,3], src_hw [B,2], scales [B]) ->
    (visited [B,V,4] original coords, visited_valid [B,V])``."""
    from aznet_tpu.api import _blob_dtype, _cast_inference_params
    from aznet_tpu.ops.preprocess import preprocess_image
    from aznet_tpu.search import az_search

    def fn(params, images, src_hw, scales):
        def one(image, hw, s):
            p = _cast_inference_params(params, cfg)
            blob, im_scale, (vh, vw) = preprocess_image(
                image, cfg.PIXEL_MEANS, cfg.TRAIN.SCALES[0],
                cfg.TRAIN.MAX_SIZE, canvas_hw[0], canvas_hw[1],
                dtype=_blob_dtype(cfg), src_hw=hw, scale=s,
            )
            feat = model.apply(p, blob[None], method="features")[0]

            def roi_fwd(f, r):
                return model.apply(p, f, r, method="roi_forward")

            _, _, _, vis, vis_ok = az_search(
                roi_fwd, feat, (vh, vw), cfg.SEAR,
                num_templates=cfg.MODEL.NUM_TEMPLATES,
                offset=cfg.BOX_OFFSET, collect_frontier=True,
            )
            return vis / im_scale, vis_ok

        return jax.vmap(one)(images, src_hw, scales)

    return fn


class RegionMiner:
    """Rotating harvest of search-visited regions over the roidb.

    ``harvest(params)`` runs one batched search over the next
    ``cfg.TRAIN.MINE_IMAGES`` images of this process's shard and updates
    ``cache[idx] -> [M, 4] float32`` (ORIGINAL image coordinates, seed
    regions dropped — the static tree already covers them).
    """

    def __init__(self, model, cfg: Config, imdb, local_indices: List[int],
                 batch_size: int = 8, max_regions: int = 96):
        from aznet_tpu.ops.preprocess import compute_scale

        self.cfg = cfg
        self.imdb = imdb
        self.indices = list(local_indices)
        self.batch_size = batch_size
        self.max_regions = max_regions
        self.cache: Dict[int, np.ndarray] = {}
        self._cursor = 0
        self._compute_scale = compute_scale
        rup = lambda v, m=32: int(-(-v // m) * m)
        roidb = imdb.roidb
        hp = rup(max(roidb[i]["height"] for i in self.indices))
        wp = rup(max(roidb[i]["width"] for i in self.indices))
        self._raw_hw = (hp, wp)
        # The train-scale canvas (same rule as minibatch's fixed_canvas).
        from aznet_tpu.data.minibatch import fixed_canvas

        self._fn = jax.jit(make_harvest_fn(model, cfg, fixed_canvas(imdb, cfg)))

    def _next_chunk(self):
        n = min(self.cfg.TRAIN.MINE_IMAGES, len(self.indices))
        out = [self.indices[(self._cursor + j) % len(self.indices)]
               for j in range(n)]
        self._cursor = (self._cursor + n) % len(self.indices)
        return out

    def harvest(self, params) -> int:
        """One mining pass; returns the number of images refreshed."""
        roidb = self.imdb.roidb
        chunk = self._next_chunk()
        hp, wp = self._raw_hw
        tcfg = self.cfg.TRAIN
        for start in range(0, len(chunk), self.batch_size):
            sub = chunk[start : start + self.batch_size]
            b = self.batch_size
            ims = np.zeros((b, hp, wp, 3), np.float32)
            src_hw = np.ones((b, 2), np.float32)
            scales = np.ones((b,), np.float32)
            for j, i in enumerate(sub):
                im = self.imdb.image_array(roidb[i])
                ims[j, : im.shape[0], : im.shape[1]] = im
                src_hw[j] = (im.shape[0], im.shape[1])
                scales[j] = self._compute_scale(
                    im.shape[0], im.shape[1], tcfg.SCALES[0], tcfg.MAX_SIZE)
            vis, ok = jax.device_get(self._fn(
                params, jnp.asarray(ims), jnp.asarray(src_hw),
                jnp.asarray(scales)))
            r_cap = self.cfg.SEAR.FRONTIER_CAP
            for j, i in enumerate(sub):
                # Drop the level-0 block (== the static seeds, already in
                # the sampler's tree), then the padding slots.
                v = vis[j][r_cap:][ok[j][r_cap:]]
                if v.shape[0] > self.max_regions:
                    v = v[-self.max_regions:]  # deepest (hardest) levels
                self.cache[i] = np.asarray(v, np.float32)
        return len(chunk)

    def mined_for(self, idx: int):
        return self.cache.get(idx)
