"""Multimodal column plumbing: treat ``html`` (and by extension image /
audio / video payloads) as opaque binary columns processed by actor-pool
``map_batches`` stages.

The real decoders (PIL / libsndfile / ffmpeg) are NOT in this container,
so the decode kernel is a clearly-marked deterministic fake
(``FakeDecoder.decode``) — the Ray-side plumbing (schema, small batch
size for wide binary rows, actor signature, fixed-width feature output
layout) is real and tested. Swap ``decode`` for a real decoder to get a
production image featurizer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

FEATURE_DIM = 8


class FakeDecoder:
    """Actor-pool 'decode + featurize' stage over a binary column.

    decode(): deterministic stand-in — an 8-bin byte histogram (density
    per bin) standing in for decoded-image features. Raises
    NotImplementedError when a real decode is requested.
    """

    def __init__(self, binary_col: str = "html", real_decode: bool = False):
        if real_decode:
            raise NotImplementedError(
                "real image/audio decoding requires PIL/ffmpeg, absent in "
                "this environment — the deterministic fake exercises the "
                "distributed plumbing"
            )
        self.binary_col = binary_col

    @staticmethod
    def decode(payloads: list[bytes]) -> np.ndarray:
        feats = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float64)
        for i, buf in enumerate(payloads):
            if not buf:
                continue
            b = np.frombuffer(buf, dtype=np.uint8)
            hist = np.bincount(b >> 5, minlength=FEATURE_DIM)[:FEATURE_DIM]
            feats[i] = hist / len(b)
        return feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.binary_col).to_pylist()
        feats = self.decode(payloads)
        return pa.table(
            {
                "url": batch.column("url"),
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
                "feature": pa.array(list(feats), pa.list_(pa.float64(), FEATURE_DIM)),
            }
        )


def q_multimodal_decode(sf_dir: str) -> ray.data.Dataset:
    """Binary decode/featurize pipeline (rows-only check: the fake
    features are engine-defined). Small batch_size: binary payload rows
    are wide, so batch x concurrency must fit worker heaps."""
    from vyperdatum_ray.fixtures import pages_paths

    ds = ray.data.read_parquet(pages_paths(sf_dir), columns=["url", "html"])
    return ds.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
        num_cpus=1,
    )


def q_html_extract(sf_dir: str) -> ray.data.Dataset:
    """Real (non-stub) html -> text extraction: strip tags with a
    vectorized Arrow regex over the binary column. The heavy-payload
    pattern: small batches, html pruned everywhere else."""
    import pyarrow.compute as pc

    from vyperdatum_ray.fixtures import pages_paths

    def extract(batch: pa.Table) -> pa.Table:
        html = pc.cast(batch.column("html"), pa.string())
        text = pc.replace_substring_regex(html, "<[^>]*>", "")
        return pa.table({"url": batch.column("url"), "extracted": text})

    ds = ray.data.read_parquet(pages_paths(sf_dir), columns=["url", "html"])
    return ds.map_batches(extract, batch_format="pyarrow", batch_size=2048)


N_FRAMES = 4


class FrameSampler:
    """Video-style frame sampling over an opaque binary column:
    k evenly-spaced windows ('frames') per payload, one feature per
    frame (mean byte value — deterministic stand-in for a real frame
    decode, which needs ffmpeg; the windowing/batching/output layout is
    the production shape)."""

    def __init__(self, binary_col: str = "html", n_frames: int = N_FRAMES):
        self.binary_col = binary_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.binary_col).to_pylist()
        feats = np.zeros((len(payloads), self.n_frames), dtype=np.float64)
        for i, buf in enumerate(payloads):
            if not buf:
                continue
            b = np.frombuffer(buf, dtype=np.uint8)
            bounds = np.linspace(0, len(b), self.n_frames + 1).astype(np.int64)
            for f in range(self.n_frames):
                win = b[bounds[f]:bounds[f + 1]]
                feats[i, f] = float(win.mean()) if len(win) else 0.0
        return pa.table(
            {
                "url": batch.column("url"),
                "frame_feature": pa.array(
                    list(np.round(feats, 6)), pa.list_(pa.float64(), self.n_frames)
                ),
            }
        )


def q_frame_sample(sf_dir: str) -> ray.data.Dataset:
    from vyperdatum_ray.fixtures import pages_paths

    ds = ray.data.read_parquet(pages_paths(sf_dir), columns=["url", "html"])
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4), num_cpus=1,
    )
