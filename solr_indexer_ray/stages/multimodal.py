"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Ray-side plumbing — schema, actor-pool stages, batch sizing for large
binary payloads, output layout — is real and tested; the *decode kernels*
are gated behind import-tries because the image/audio libraries are not in
this container: with no decoder available a stage either raises
``NotImplementedError`` (``strict=True``) or applies a deterministic fake
decode that parses this module's synthetic blob header (``strict=False``,
the test path).  This mirrors how the reference gates optional backends at
import time (xarray-vs-netCDF4 selection, ``/root/reference/solrindexer/
tools.py:31-46``) and injects enrichment classes (thumbnail generators,
``solrindexer/mmd.py:1334-1390`` ST4).

Synthetic blob format (deterministic, for tests):
``b"FAKEIMG1" | width:uint32le | height:uint32le | payload bytes``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKEIMG1"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("mime", pa.string()),
        ("data", pa.binary()),
    ]
)

FEATURE_BINS = 16


def make_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic synthetic blob (payload derived from media_id)."""
    rng = np.random.default_rng(media_id)
    payload = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return MAGIC + struct.pack("<II", width, height) + payload.tobytes()


def fake_media_table(n: int, seed: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "mime": "image/x-fake",
                "data": make_fake_image(i, w, h),
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class DecodeImageStage:
    """Actor-pool stage: binary blob -> (width, height, n_bytes, sha256,
    feature vector).  Decoder state resolved ONCE in ``__init__`` (actor
    lifecycle), never per batch.

    ``strict=True`` raises ``NotImplementedError`` when no real decoder is
    installed — the clearly-marked stub the brief asks for.  With
    ``strict=False`` the deterministic fake decode parses the synthetic
    header and computes a 16-bin byte histogram as the feature vector.
    """

    def __init__(self, strict: bool = False):
        self.pil = _try_import_pil()
        self.strict = strict

    def _decode(self, blob: bytes):
        # synthetic blobs decode the same everywhere (CI determinism),
        # with or without Pillow installed
        if blob[: len(MAGIC)] == MAGIC:
            w, h = struct.unpack("<II", blob[len(MAGIC):len(MAGIC) + 8])
            payload = np.frombuffer(blob[len(MAGIC) + 8:], dtype=np.uint8)
            return w, h, payload
        if self.pil is not None:
            import io

            img = self.pil.open(io.BytesIO(blob))  # pragma: no cover
            arr = np.asarray(img.convert("L"), dtype=np.uint8).ravel()
            return img.width, img.height, arr
        if self.strict:
            raise NotImplementedError(
                "no image decoder available in this environment "
                "(install Pillow) and blob is not a synthetic fake"
            )
        return 0, 0, np.frombuffer(blob, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, nbytes, shas, feats = [], [], [], [], []
        for blob in batch["data"].to_pylist():
            w, h, payload = self._decode(blob)
            widths.append(w)
            heights.append(h)
            nbytes.append(len(blob))
            shas.append(hashlib.sha256(blob).hexdigest())
            hist, _ = np.histogram(payload, bins=FEATURE_BINS, range=(0, 256))
            total = max(1, int(hist.sum()))
            feats.append((hist / total).astype(np.float32).tolist())
        batch = batch.drop_columns(["data"])  # decoded: drop the heavy bytes
        for name, arr in (
            ("width", pa.array(widths, pa.int32())),
            ("height", pa.array(heights, pa.int32())),
            ("n_bytes", pa.array(nbytes, pa.int64())),
            ("sha256", pa.array(shas, pa.string())),
            ("features", pa.array(feats, pa.list_(pa.float32()))),
        ):
            batch = batch.append_column(name, arr)
        return batch


class ResizeImageStage:
    """Resize stage: real actor plumbing, decoder-dependent kernel.

    Synthetic ``FAKEIMG1`` blobs resize deterministically everywhere
    (header rewrite + strided payload subsample) so CI output shapes are
    stable with or without Pillow.  Real image bytes resize through
    Pillow when it is importable (``Image.open`` -> ``resize(NEAREST)``
    -> re-encode PNG: NEAREST and PNG keep the output deterministic
    across library builds); without Pillow a non-synthetic blob raises
    in ``strict`` mode or passes through untouched otherwise.
    """

    def __init__(self, width: int, height: int, strict: bool = False):
        self.width, self.height = width, height
        self.pil = _try_import_pil()
        self.strict = strict

    def _resize_real(self, blob: bytes) -> bytes:  # pragma: no cover
        import io

        img = self.pil.open(io.BytesIO(blob))
        resized = img.resize(
            (self.width, self.height), self.pil.Resampling.NEAREST
        )
        buf = io.BytesIO()
        resized.save(buf, format="PNG")
        return buf.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch["data"].to_pylist():
            if blob[: len(MAGIC)] == MAGIC:
                payload = np.frombuffer(blob[len(MAGIC) + 8:], dtype=np.uint8)
                need = self.width * self.height
                idx = (np.arange(need) * max(1, payload.size // need)) % max(
                    1, payload.size
                )
                resized = (
                    payload[idx] if payload.size else np.zeros(need, np.uint8)
                )
                out.append(
                    MAGIC + struct.pack("<II", self.width, self.height)
                    + resized.tobytes()
                )
                continue
            if self.pil is not None:  # pragma: no cover
                out.append(self._resize_real(blob))
                continue
            if self.strict:
                raise NotImplementedError("no image decoder available")
            out.append(blob)
        return batch.set_column(
            batch.schema.get_field_index("data"), "data",
            pa.array(out, pa.binary()),
        )


def decode_media(ds, concurrency: int = 2, batch_size: int = 32, strict=False):
    """Run the decode actor pool.  Small ``batch_size`` on purpose: batches
    carry large binary payloads, so batch × concurrency must fit the worker
    heap (memory-aware sizing per the brief)."""
    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
