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
