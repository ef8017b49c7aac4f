"""Dataset + fixed-shape batch iteration.

Replaces torch-geometric's dynamic graph batching (reference
``train_traffic.py:236-247``) with static-shape padded batches: every batch
is (B, NA_max, ...) so jit compiles once. Scenes with more than NA_max
agents keep the ego plus the NA_max-1 agents nearest to it (distance at the
last past step), mirroring how the reference's dynamic Σ-NA batching bounds
compute. The tail batch is padded with zero-mask scenes (fully masked out of
every loss), not dropped.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from ..scene import SceneBatch, pad_scene_arrays


def _trim_scene(sc, na_max):
    na = sc["past"].shape[0]
    if na <= na_max:
        return sc
    ego_pos = sc["past"][0, -1, :2]
    d = np.linalg.norm(sc["past"][:, -1, :2] - ego_pos, axis=-1)
    d[0] = -1.0  # ego always kept
    keep = np.argsort(d)[:na_max]
    keep.sort()
    out = {}
    for k, v in sc.items():
        out[k] = v[keep] if isinstance(v, np.ndarray) and v.ndim >= 1 and \
            v.shape[0] == na else v
    return out


class SceneDataset:
    """A list of per-scene dicts with padding/bucketing into SceneBatches.

    With ``buckets`` (e.g. ``(8, 16, 32)``, SURVEY §7.1), dense scenes KEEP
    all their agents up to the largest bucket — matching the reference,
    which never drops agents (``nuscenes_dataset.py:605-649``) — and
    ``bucketed_batch_iterator`` groups same-bucket scenes so jit compiles
    one variant per bucket instead of padding everything to the max.
    Without buckets, scenes are trimmed to ``na_max`` (ego + nearest).
    """

    def __init__(self, scenes: List[dict], na_max: int, nc: int,
                 buckets=None):
        if buckets:
            buckets = tuple(sorted(set(int(b) for b in buckets)))
            cap = buckets[-1]
        else:
            cap = na_max
        self.scenes = [_trim_scene(s, cap) for s in scenes]
        self.na_max = cap
        self.nc = nc
        self.buckets = buckets

    def __len__(self):
        return len(self.scenes)

    def scene_dict(self, i):
        return self.scenes[i]

    def bucket_of(self, i) -> int:
        """Smallest bucket holding scene i (na_max without buckets)."""
        na = self.scenes[i]["past"].shape[0]
        if not self.buckets:
            return self.na_max
        for b in self.buckets:
            if na <= b:
                return b
        return self.buckets[-1]

    def get_batch(self, indices, na=None) -> SceneBatch:
        return pad_scene_arrays([self.scene_dict(i) for i in indices],
                                na if na is not None else self.na_max,
                                self.nc)


class ConcatSceneDataset:
    """Concatenate datasets exposing scene_dict(i) (same PT/FT/NC shapes)."""

    def __init__(self, datasets):
        self.datasets = [d for d in datasets if len(d) > 0]
        self.na_max = self.datasets[0].na_max
        self.nc = self.datasets[0].nc
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def scene_dict(self, i):
        d = int(np.searchsorted(self._offsets, i, side="right")) - 1
        return self.datasets[d].scene_dict(i - int(self._offsets[d]))

    def get_batch(self, indices) -> SceneBatch:
        return pad_scene_arrays([self.scene_dict(i) for i in indices],
                                self.na_max, self.nc)


def batch_iterator(ds: SceneDataset, batch_size: int, shuffle=True,
                   seed: Optional[int] = 0,
                   drop_last=False) -> Iterator[SceneBatch]:
    """Yield fixed-shape SceneBatches; the tail is padded with masked-out
    copies of scene 0 so every batch has identical shapes."""
    order = np.arange(len(ds))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        if len(idx) < batch_size:
            if drop_last:
                return
            pad_n = batch_size - len(idx)
            batch = ds.get_batch(list(idx) + [int(order[0])] * pad_n)
            # mask out the padded scenes entirely
            mask = np.asarray(batch.mask).copy()
            mask[len(idx):] = False
            import jax.numpy as jnp

            yield batch.replace(mask=jnp.asarray(mask))
        else:
            yield ds.get_batch(idx)


def bucketed_batch_iterator(ds, batch_size: int, shuffle=True,
                            seed: Optional[int] = 0,
                            drop_last=False) -> Iterator[SceneBatch]:
    """Yield SceneBatches where every batch contains scenes of ONE NA
    bucket, padded to that bucket's agent count.

    Replaces the reference's dynamic Σ-NA batching
    (``adv_scenario_gen.py:228-256``) with a jit-friendly scheme: at most
    ``len(ds.buckets)`` compiled variants, and dense scenes keep all their
    agents instead of being trimmed (VERDICT r1 item 7).
    """
    if not getattr(ds, "buckets", None):
        yield from batch_iterator(ds, batch_size, shuffle=shuffle, seed=seed,
                                  drop_last=drop_last)
        return
    by_bucket = {}
    for i in range(len(ds)):
        by_bucket.setdefault(ds.bucket_of(i), []).append(i)
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    # Form all per-bucket batches first, then shuffle the combined batch
    # list: same compile-variant count, but the epoch's gradient stream is
    # no longer correlated by scene density (bucket-major ordering would
    # feed all dense scenes consecutively, unlike the reference's fully
    # shuffled batching).
    planned = []  # (bucket, sel_indices, pad_source)
    for b in sorted(by_bucket):
        idx = np.asarray(by_bucket[b])
        if shuffle:
            rng.shuffle(idx)
        for start in range(0, len(idx), batch_size):
            sel = idx[start : start + batch_size]
            if len(sel) < batch_size and drop_last:
                continue
            planned.append((b, sel, int(idx[0])))
    if shuffle:
        rng.shuffle(planned)
    for b, sel, pad_src in planned:
        if len(sel) < batch_size:
            pad_n = batch_size - len(sel)
            batch = ds.get_batch(list(sel) + [pad_src] * pad_n, na=b)
            mask = np.asarray(batch.mask).copy()
            mask[len(sel):] = False
            yield batch.replace(mask=jnp.asarray(mask))
        else:
            yield ds.get_batch(list(sel), na=b)
