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
        self.decoders = {"image/fake": self._decode_fake,
                         "image/x-portable-graymap": self._decode_pgm}
        if _HAVE_PIL:
            self.decoders["image/png"] = self._decode_pil

    @staticmethod
    def _decode_pgm(payload: bytes):
        w, h, _, raster = decode_netpbm(payload)
        return -1, w, h, raster

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
            if mt == "image/x-portable-graymap":
                # real format in -> real format out
                out_payloads.append(encode_pgm(small.astype(np.uint8)))
            else:
                header = _MAGIC + np.array(
                    [mid, self.target_w, self.target_h], dtype=np.int64
                ).tobytes()
                out_payloads.append(header
                                    + small.astype(np.uint8).tobytes())
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


# --- REAL codecs the container can handle without external libs --------
# netpbm (PGM P5 / PPM P6): pure-numpy raster parsing — a real image
# format any tool reads; WAV PCM via the stdlib `wave` module. These
# upgrade the decode boundary from "declared stub" to real for the
# formats that need no native codec; JPEG/PNG/MP4 remain declared stubs.

def encode_pgm(pixels: np.ndarray) -> bytes:
    """Encode a uint8 (h, w) array as binary PGM (P5)."""
    h, w = pixels.shape
    return (f"P5\n{w} {h}\n255\n".encode("ascii")
            + pixels.astype(np.uint8).tobytes())


def decode_netpbm(payload: bytes):
    """Decode binary PGM (P5) / PPM (P6): (width, height, channels,
    flat uint8 samples). Header: magic, whitespace/comment-separated
    width height maxval, single whitespace, raster."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    channels = 1 if payload[:2] == b"P5" else 3
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = w * h * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return w, h, channels, raster


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 mono PCM as WAV (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Decode a WAV payload: (rate, int16 sample array)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        raw = wf.readframes(n)
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        samples = np.frombuffer(raw, dtype="<i2")
        if wf.getnchannels() > 1:
            samples = samples.reshape(-1, wf.getnchannels()).mean(axis=1)
    return rate, np.asarray(samples)


def synth_real_media(sf_dir: str) -> rd.Dataset:
    """REAL media payloads derived deterministically from documents:
    even doc_ids become PGM gradient images, odd ones WAV sine tones."""
    docs = read(sf_dir, "documents", ["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads, types, widths, heights = [], [], [], []
        for i in ids:
            rng = np.random.default_rng(int(i) + 7)
            if i % 2 == 0:
                w, h = int(rng.integers(8, 40)), int(rng.integers(8, 40))
                yy, xx = np.mgrid[0:h, 0:w]
                px = ((xx * 255 // max(w - 1, 1))
                      + (yy * 31 // max(h - 1, 1))) % 256
                payloads.append(encode_pgm(px.astype(np.uint8)))
                types.append("image/x-portable-graymap")
                widths.append(w)
                heights.append(h)
            else:
                n = int(rng.integers(400, 1600))
                freq = float(rng.uniform(100, 1000))
                tgrid = np.arange(n) / 16000.0
                samples = (10000 * np.sin(2 * np.pi * freq * tgrid)
                           ).astype(np.int16)
                payloads.append(encode_wav(samples))
                types.append("audio/wav")
                widths.append(n)   # width column doubles as sample count
                heights.append(1)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "media_type": pa.array(types),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
        })

    return docs.map_batches(gen, batch_format="pyarrow", batch_size=256)


class RealMediaFeatureStage:
    """Actor-pool feature extraction over REAL payloads: netpbm decode
    (mean/std brightness) and WAV decode (RMS, zero-crossing rate,
    duration). Same stage shape as MediaDecodeStage — constructor state
    once per actor, small batches bound payload memory."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        kind, f1, f2, f3 = [], [], [], []
        for mt, p in zip(types, payloads):
            if mt == "image/x-portable-graymap":
                w, h, _, raster = decode_netpbm(p)
                kind.append("image")
                f1.append(float(raster.mean()))       # brightness
                f2.append(float(raster.std()))        # contrast
                f3.append(float(w * h))               # pixels
            elif mt == "audio/wav":
                rate, samples = decode_wav(p)
                x = samples.astype(np.float64)
                kind.append("audio")
                f1.append(float(np.sqrt(np.mean(x * x))))      # RMS
                zc = np.count_nonzero(np.diff(np.signbit(x)))
                f2.append(float(zc) / max(len(x) - 1, 1))      # ZCR
                f3.append(len(x) / float(rate))                # seconds
            else:
                raise NotImplementedError(
                    f"no codec for {mt!r} in this container (stub)")
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": pa.array(kind),
            "f_mean_or_rms": pa.array(f1, type=pa.float64()),
            "f_std_or_zcr": pa.array(f2, type=pa.float64()),
            "f_size_or_secs": pa.array(f3, type=pa.float64()),
        })


def media_real_features(sf_dir: str) -> rd.Dataset:
    """Driver query: real PGM/WAV decode + features via the actor pool."""
    return synth_real_media(sf_dir).map_batches(
        RealMediaFeatureStage, batch_format="pyarrow", batch_size=128,
        concurrency=2)
