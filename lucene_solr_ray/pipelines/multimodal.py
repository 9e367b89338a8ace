"""Multimodal columns: opaque binary payloads + typed metadata.

The container ships no image/audio codecs, so the *decode* kernel is
stubbed (deterministic fake, or ``NotImplementedError`` for real formats),
while all Ray-side plumbing — schema, actor-pool stage shape, batch
sizing, zero-copy binary columns, output layout — is real and tested.

Layout convention: a media table is
``(media_id:int64, payload:binary, media_type:string, width:int32,
height:int32)``; payloads are opaque bytes. Binary columns stay in
``batch_format="pyarrow"`` (pandas would box them as objects), and media
stages use small ``batch_size`` so batch x concurrency of payload bytes
fits a worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .util import read

try:  # real decoder if ever available; stubbed otherwise
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_MAGIC = b"FAKEIMG1"


def synth_media(sf_dir: str, payload_bytes: int = 4096) -> rd.Dataset:
    """Deterministic fake media table derived from documents: payload =
    seeded bytes with a parseable fake header (media_id, w, h)."""
    docs = read(sf_dir, "documents", ["doc_id", "n_chars"])

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads, widths, heights = [], [], []
        for i in ids:
            rng = np.random.default_rng(int(i) + 1000)
            w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
            body = rng.integers(0, 256, size=payload_bytes, dtype=np.uint8)
            header = _MAGIC + np.array([i, w, h], dtype=np.int64).tobytes()
            payloads.append(header + body.tobytes())
            widths.append(w)
            heights.append(h)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_type": pa.array(["image/fake"] * len(ids)),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
        })

    return docs.map_batches(gen, batch_format="pyarrow", batch_size=256)


class MediaDecodeStage:
    """Actor-pool decode stage: state (codec registry) built once per actor.

    Real formats raise ``NotImplementedError`` here (no codecs in the
    container); the fake format decodes deterministically so the full
    pipeline shape is exercised end-to-end.
    """

    def __init__(self):
        self.decoders = {"image/fake": self._decode_fake}
        if _HAVE_PIL:
            self.decoders["image/png"] = self._decode_pil

    @staticmethod
    def _decode_fake(payload: bytes):
        if payload[:8] != _MAGIC:
            raise ValueError("bad fake-image header")
        media_id, w, h = np.frombuffer(payload[8:32], dtype=np.int64)
        body = np.frombuffer(payload[32:], dtype=np.uint8)
        return int(media_id), int(w), int(h), body

    @staticmethod
    def _decode_pil(payload: bytes):
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload))
        arr = np.asarray(img)
        return -1, img.width, img.height, arr.ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        means, stds, nbytes = [], [], []
        for mt, p in zip(types, payloads):
            dec = self.decoders.get(mt)
            if dec is None:
                raise NotImplementedError(
                    f"no decoder for {mt!r} in this container (stub)")
            _, w, h, body = dec(p)
            means.append(float(body.mean()))
            stds.append(float(body.std()))
            nbytes.append(len(p))
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "payload_bytes": pa.array(nbytes, type=pa.int64()),
            "mean_byte": pa.array(means, type=pa.float64()),
            "std_byte": pa.array(stds, type=pa.float64()),
        })


def media_features(sf_dir: str) -> rd.Dataset:
    """Decode + feature-extract via the actor pool (small batches: payload
    bytes x batch_size x concurrency bounds worker heap)."""
    media = synth_media(sf_dir)
    return media.map_batches(MediaDecodeStage, batch_format="pyarrow",
                             batch_size=128, concurrency=2)


class MediaResizeStage:
    """Actor-pool resize stage: decode -> nearest-neighbor resample to
    (target_w, target_h) -> re-encode in the fake container. The resample
    itself is real vectorized work (index-grid gather over the pixel
    buffer); only the codec boundary is stubbed, so swapping in PIL later
    changes ONE method, not the pipeline shape."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.target_w = int(target_w)
        self.target_h = int(target_h)
        self.decode = MediaDecodeStage()

    def _resample(self, body: np.ndarray, w: int, h: int) -> np.ndarray:
        # interpret the payload body as row-major h x w (tiling/truncating
        # the fake buffer to fit), then NN-gather the target grid
        need = w * h
        px = np.resize(body, need).reshape(h, w)
        ys = (np.arange(self.target_h) * h // self.target_h)
        xs = (np.arange(self.target_w) * w // self.target_w)
        return px[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        out_payloads = []
        for mid, mt, p in zip(ids, types, payloads):
            dec = self.decode.decoders.get(mt)
            if dec is None:
                raise NotImplementedError(
                    f"no decoder for {mt!r} in this container (stub)")
            _, w, h, body = dec(p)
            small = self._resample(body, w, h)
            header = _MAGIC + np.array(
                [mid, self.target_w, self.target_h], dtype=np.int64
            ).tobytes()
            out_payloads.append(header + small.astype(np.uint8).tobytes())
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(out_payloads, type=pa.large_binary()),
            "media_type": batch.column("media_type"),
            "width": pa.array([self.target_w] * n, type=pa.int32()),
            "height": pa.array([self.target_h] * n, type=pa.int32()),
        })


def resize_media(ds: rd.Dataset, target_w: int = 32, target_h: int = 32,
                 concurrency: int = 2) -> rd.Dataset:
    """Resize via the actor pool (constructor state once per actor).

    Fractional num_cpus: several media actor-pool stages commonly chain
    (resize -> decode/feature) in ONE streaming DAG; whole-CPU actors
    would reserve the entire small cluster and starve the upstream read
    tasks (the same deadlock class util.native_join guards against)."""
    return ds.map_batches(
        MediaResizeStage, batch_format="pyarrow", batch_size=128,
        concurrency=concurrency, num_cpus=0.5,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h})


def frame_sample(ds: rd.Dataset, every_n: int = 10) -> rd.Dataset:
    """Frame-sampling analog: keep every n-th media row (deterministic)."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % every_n == 0))

    return ds.map_batches(fn, batch_format="pyarrow")
