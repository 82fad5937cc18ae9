"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind ``decoder=`` (real decode raises
``NotImplementedError``, clearly marked). Everything around it — the Arrow
``binary`` schema, small-batch sizing for large payloads, actor signature,
output layout — is real and tested, which is the contract this module
demonstrates: at scale the only change is swapping the decoder callable.

Payload rows here are derived from ``documents`` (utf-8 bytes) purely so the
pipeline has deterministic input in this sandbox.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.fulltext import _round_vec, read_documents

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("kind", pa.string()),
        ("meta", pa.string()),
    ]
)


def media_from_documents(sf_dir: str):
    """Dress documents as a media table: payload = utf-8 bytes of text."""

    def to_media(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "media_id": batch["doc_id"],
                "payload": pa.array([(t or "").encode("utf-8") for t in texts], type=pa.binary()),
                "kind": pa.array(["text"] * len(texts), type=pa.string()),
                "meta": pa.array(["{}"] * len(texts), type=pa.string()),
            },
            schema=MEDIA_SCHEMA,
        )

    return read_documents(sf_dir).map_batches(to_media, batch_format="pyarrow", batch_size=512)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — real image decode needs a codec library not present in this
    container. The Ray-side plumbing calls ``FeatureExtract`` with a
    deterministic fake decoder instead."""
    raise NotImplementedError("image decode requires a codec library (not in this container)")


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes as a uint8 array."""
    return np.frombuffer(payload, dtype=np.uint8)


class FeatureExtract:
    """Actor-pool feature stage: decoder + 'model' state built once per actor
    (__init__), per-batch vectorized feature computation (__call__). Output:
    (media_id, n_bytes, mean_byte_r, hist: list<float>[16])."""

    def __init__(self, decoder=fake_decode, bins: int = 16):
        self.decoder = decoder
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bytes, mean_byte, hists = [], [], []
        for payload in batch["payload"].to_pylist():
            arr = self.decoder(payload or b"")
            n = int(arr.size)
            n_bytes.append(n)
            mean_byte.append(float(arr.mean()) if n else 0.0)
            h = np.histogram(arr, bins=self.edges)[0] if n else np.zeros(self.bins, dtype=np.int64)
            hists.append((h / max(1, n)).astype(np.float64).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "mean_byte_r": pa.array(
                    _round_vec(np.asarray(mean_byte, dtype=np.float64)), type=pa.float64()
                ),
                "hist": pa.array(hists, type=pa.list_(pa.float64())),
            }
        )


def multimodal_features(sf_dir: str):
    """End-to-end media pipeline with the fake decoder; small batch_size is
    deliberate (large binary payloads × concurrency must fit worker heap)."""
    return media_from_documents(sf_dir).map_batches(
        FeatureExtract, batch_format="pyarrow", batch_size=256, concurrency=2
    )


class FrameSample:
    """Actor-pool frame-sampling stage for video-like payloads: treat the
    payload as fixed-size frames, keep every ``stride``-th frame, emit one
    row per kept frame with its byte slice. Real decoders slot in via
    ``decoder=``; the plumbing (explode shape, per-frame metadata, memory
    sizing) is what this stage demonstrates."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4, decoder=fake_decode):
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idx, frames = [], [], []
        fb, stride = self.frame_bytes, self.stride
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            arr = self.decoder(payload or b"")
            n_frames = arr.size // fb
            for k in range(0, n_frames, stride):
                media_ids.append(mid)
                frame_idx.append(k)
                frames.append(arr[k * fb : (k + 1) * fb].tobytes())
        return pa.table(
            {
                "media_id": pa.array(media_ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def frame_sample(sf_dir: str, stride: int = 4):
    """Frame-sampled media table (rows-only check: binary payloads)."""
    return media_from_documents(sf_dir).map_batches(
        FrameSample,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )


def frame_sample_hex(sf_dir: str, stride: int = 4):
    """``frame_sample`` with frames as lowercase hex strings — the
    hash-checkable projection of the binary pipeline (the driver compare
    and DuckDB both handle strings natively; the binary entry stays
    rows-only)."""

    def to_hex(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame_idx": batch["frame_idx"],
                "frame_hex": pa.array(
                    [(b or b"").hex() for b in batch["frame"].to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    return frame_sample(sf_dir, stride).map_batches(to_hex, batch_format="pyarrow")


def multimodal_features_flat(sf_dir: str):
    """(media_id, n_bytes, mean_byte_r, bin, frac_r) — the feature pipeline
    with the 16-bin byte histogram EXPLODED to one row per bin (fractions
    rounded at 4 dp): the hash-checkable projection of
    ``multimodal_features`` (whose list<float> column stays rows-only)."""
    from searchengine_ray.pipelines.fulltext import _round_vec

    def explode(batch: pa.Table) -> pa.Table:
        ids, nb, mb, bins, fracs = [], [], [], [], []
        for mid, n, m, hist in zip(
            batch["media_id"].to_pylist(),
            batch["n_bytes"].to_pylist(),
            batch["mean_byte_r"].to_pylist(),
            batch["hist"].to_pylist(),
        ):
            for b, f in enumerate(hist):
                ids.append(mid)
                nb.append(n)
                mb.append(m)
                bins.append(b)
                fracs.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "n_bytes": pa.array(nb, type=pa.int64()),
                "mean_byte_r": pa.array(mb, type=pa.float64()),
                "bin": pa.array(bins, type=pa.int32()),
                "frac_r": pa.array(
                    _round_vec(np.asarray(fracs, dtype=np.float64)), type=pa.float64()
                ),
            }
        )

    return multimodal_features(sf_dir).map_batches(explode, batch_format="pyarrow")
