"""Device-resident frame cache: upload the dataset once, index on device.

The reference streams each training image host->GPU every step through its
DataLoader (``/root/reference/scene/scene.py`` + torch pin-memory), which
is nearly free over PCIe. On a TPU — and especially over a remote-device
link — a per-step host->device image transfer serializes with the step and
can dominate wall-clock (measured ~1.2 s/step at 800x800 on the tunnel vs
a ~30 ms device step). 3DGS datasets are small (tens to a few hundred
frames), so the TPU-native answer is to keep the WHOLE training split
device-resident: one upload at startup, then every step's frame fetch is a
device-side row slice instead of a host transfer.

Frames are grouped by their decoded (height, width) so each group stacks
into one dense ``[N, H, W, 3]`` array (COLMAP scenes may mix camera
resolutions). A byte budget guards HBM: if the split would exceed it, the
cache reports itself unavailable and the caller falls back to streaming.
"""

from __future__ import annotations

import concurrent.futures
import functools
import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=1)
def _slicer():
    import jax

    @jax.jit
    def fn(images, masks, w2cs, ks, slot):
        return images[slot], masks[slot], w2cs[slot], ks[slot]

    return fn


def _slice_frame(images, masks, w2cs, ks, slot):
    return _slicer()(images, masks, w2cs, ks, slot)


class DeviceFrameCache:
    """Device-side stacked frames for one split of a Scene.

    ``get(index)`` takes a SPLIT index (same space as ``Scene.get_data``)
    and returns the same dict contract (image/mask/w2c/K/height/width)
    with jax device arrays for the tensor entries — consumers that
    ``jnp.asarray`` them get no-ops. Repeated (index-tiled) frames share
    one device copy.
    """

    def __init__(
        self,
        scene,
        split: str,
        budget_mb: int = 6144,
        num_workers: int = 4,
        pad_rows_to: int = 1,
    ):
        """``pad_rows_to``: pad each frame's height up to a multiple (the
        mesh stripe count) AT UPLOAD TIME — image pad rows zero, mask pad
        rows one (= ignored by the mask-compositing loss), so sharded
        steps read device-resident stripe-ready frames with no per-step
        host padding or transfer."""
        import jax

        self._pad_rows_to = max(1, int(pad_rows_to))
        indexes = (
            scene.train_indexes if split == "train" else scene.eval_indexes
        )
        self._indexes = indexes
        frame_ids = sorted(set(indexes))
        # budget precheck from declared frame sizes (decoded images are
        # never larger: on-disk files may only be downscaled copies)
        est = sum(
            scene.frames[i].height * scene.frames[i].width * 4 * 4
            for i in frame_ids
        )
        self.available = est <= budget_mb * (1 << 20)
        if not self.available:
            logger.info(
                f"device frame cache: {split} split needs ~"
                f"{est / 1e6:.0f} MB > budget {budget_mb} MB — falling "
                "back to streamed host->device transfers"
            )
            return

        # decode every unique frame once (threaded: PIL decode releases
        # the GIL), group by decoded shape, stack, upload once per group
        with concurrent.futures.ThreadPoolExecutor(num_workers) as pool:
            decoded = list(
                pool.map(lambda i: scene.frames[i].load(), frame_ids)
            )
        groups: Dict[Tuple[int, int], List[int]] = {}
        for pos, d in enumerate(decoded):
            groups.setdefault((d["height"], d["width"]), []).append(pos)
        self._groups: Dict[Tuple[int, int], Dict[str, Any]] = {}
        self._slot: Dict[int, Tuple[Tuple[int, int], int]] = {}
        total = 0
        for (h, w), positions in groups.items():
            pr = self._pad_rows_to
            hp = -(-h // pr) * pr
            imgs = np.zeros((len(positions), hp, w, 3), np.float32)
            # pad rows masked OUT (mask semantics: 1 = ignore pixel)
            masks = np.ones((len(positions), hp, w), np.float32)
            w2cs = np.empty((len(positions), 4, 4), np.float32)
            ks = np.empty((len(positions), 3, 3), np.float32)
            for slot, pos in enumerate(positions):
                d = decoded[pos]
                imgs[slot, :h] = d["image"]
                masks[slot, :h] = d["mask"]
                w2cs[slot] = d["w2c"]
                ks[slot] = d["K"]
                self._slot[frame_ids[pos]] = ((h, w), slot)
            self._groups[(h, w)] = dict(
                image=jax.device_put(imgs),
                mask=jax.device_put(masks),
                w2c=jax.device_put(w2cs),
                K=jax.device_put(ks),
            )
            total += imgs.nbytes + masks.nbytes
        logger.info(
            f"device frame cache: {split} split resident on device "
            f"({len(frame_ids)} frames, {total / 1e6:.0f} MB, "
            f"{len(groups)} size group(s))"
        )

    def get(self, index: int) -> Dict[str, Any]:
        """One JITTED slice dispatch (eager indexing would cost one
        device round trip PER ARRAY on a remote-device link); the only
        per-step host->device traffic is the int32 slot id."""
        (h, w), slot = self._slot[self._indexes[index]]
        g = self._groups[(h, w)]
        img, mask, w2c, k = _slice_frame(
            g["image"], g["mask"], g["w2c"], g["K"], np.int32(slot)
        )
        return dict(image=img, mask=mask, w2c=w2c, K=k, height=h, width=w)


def build_cache(
    scene, split: str, budget_mb: int, num_workers: int = 4,
    pad_rows_to: int = 1,
) -> Optional[DeviceFrameCache]:
    """Build a cache for ``split``; returns None when it does not fit the
    byte budget (callers stream instead)."""
    cache = DeviceFrameCache(
        scene, split, budget_mb, num_workers, pad_rows_to=pad_rows_to
    )
    return cache if cache.available else None
