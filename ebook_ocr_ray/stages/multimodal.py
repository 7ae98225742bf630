"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container ships no image/audio codecs, so the DECODE step is a
clearly-marked stub seam (`_decode_*_real` raise NotImplementedError; a
deterministic fake decoder stands in), while everything Ray-side — the
schema, batch shapes, actor-pool signatures, memory-aware batch sizing,
output layout — is real and tested. Swapping in Pillow / soundfile /
PyAV changes only the two `_decode_*_real` functions.

Media payload format (deterministic synthetic):
    image: b"FAKEIMG\\0" + width:u32 + height:u32 + seed:u32  (+ pad)
    audio: b"FAKEAUD\\0" + n_samples:u32 + rate:u32 + seed:u32
    video: b"FAKEVID\\0" + n_frames:u32 + w:u32 + h:u32 + seed:u32

The fake decoders expand those headers into deterministic numpy arrays —
same shapes and dtypes a real decoder would produce — so every downstream
kernel (resize, feature extraction, frame sampling) runs real vectorized
math on real array shapes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ebook_ocr_ray.reads import read_parquet_clean

IMG_MAGIC = b"FAKEIMG\0"
AUD_MAGIC = b"FAKEAUD\0"
VID_MAGIC = b"FAKEVID\0"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),     # typed metadata columns (0 if n/a)
        ("meta_height", pa.int32()),
        ("meta_samples", pa.int32()),
        ("meta_rate", pa.int32()),
        ("meta_frames", pa.int32()),
    ]
)


# --- synthesis (deterministic; no RNG state) -------------------------------


def synth_image(media_id: int, width: int = 64, height: int = 48) -> bytes:
    return IMG_MAGIC + struct.pack("<III", width, height, media_id)


def synth_audio(media_id: int, n_samples: int = 8000, rate: int = 16000) -> bytes:
    return AUD_MAGIC + struct.pack("<III", n_samples, rate, media_id)


def synth_video(media_id: int, n_frames: int = 30, w: int = 32, h: int = 24) -> bytes:
    return VID_MAGIC + struct.pack("<IIII", n_frames, w, h, media_id)


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> media rows (one per doc, kind by doc_id % 3)."""
    ids = batch["doc_id"].to_pylist()
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in ids:
        kind = ("image", "audio", "video")[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        if kind == "image":
            w, h = 32 + (i % 8) * 16, 24 + (i % 5) * 12
            rows["payload"].append(synth_image(i, w, h))
            rows["meta_width"].append(w)
            rows["meta_height"].append(h)
            rows["meta_samples"].append(0)
            rows["meta_rate"].append(0)
            rows["meta_frames"].append(0)
        elif kind == "audio":
            n, r = 4000 + (i % 10) * 800, 16000
            rows["payload"].append(synth_audio(i, n, r))
            rows["meta_width"].append(0)
            rows["meta_height"].append(0)
            rows["meta_samples"].append(n)
            rows["meta_rate"].append(r)
            rows["meta_frames"].append(0)
        else:
            f, w, h = 10 + i % 20, 32, 24
            rows["payload"].append(synth_video(i, f, w, h))
            rows["meta_width"].append(w)
            rows["meta_height"].append(h)
            rows["meta_samples"].append(0)
            rows["meta_rate"].append(0)
            rows["meta_frames"].append(f)
    return pa.Table.from_arrays(
        [pa.array(rows[n], MEDIA_SCHEMA.field(n).type) for n in MEDIA_SCHEMA.names],
        schema=MEDIA_SCHEMA,
    )


# --- decode seam -----------------------------------------------------------


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Production seam: Pillow/torchvision decode. Not available here."""
    raise NotImplementedError("no image codec in this container — wire Pillow here")


def _decode_audio_real(payload: bytes) -> tuple[np.ndarray, int]:
    raise NotImplementedError("no audio codec in this container — wire soundfile here")


def decode_image(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8. Deterministic fake expansion of the header."""
    if not payload.startswith(IMG_MAGIC):
        return _decode_image_real(payload)
    w, h, seed = struct.unpack("<III", payload[8:20])
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = (xx * 3 + yy * 7 + seed) % 256
    return np.stack([base, (base * 2) % 256, (base * 5) % 256], axis=-1).astype(np.uint8)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """(n_samples,) float32 in [-1, 1], sample rate. The fake waveform is
    an integer sawtooth (exact two-decimal values): every downstream
    feature (frame RMS, zero crossings) is then closed-form in integer
    arithmetic, so the audio feature pipeline is fully oracle-checkable —
    a float32 sine's argument rounding would drift past hash precision."""
    if not payload.startswith(AUD_MAGIC):
        return _decode_audio_real(payload)
    n, rate, seed = struct.unpack("<III", payload[8:20])
    t = np.arange(n, dtype=np.int64)
    wave = ((((t * 7 + seed) % 200) - 100) / 100.0).astype(np.float32)
    return wave, rate


def decode_video_frames(payload: bytes, sample_every: int) -> list[np.ndarray]:
    """Every ``sample_every``-th frame as (H, W, 3) uint8."""
    if sample_every < 1:
        raise ValueError(f"sample_every must be >= 1, got {sample_every}")
    if not payload.startswith(VID_MAGIC):
        raise NotImplementedError("no video codec in this container — wire PyAV here")
    f, w, h, seed = struct.unpack("<IIII", payload[8:24])
    frames = []
    for idx in range(0, f, sample_every):
        frames.append(decode_image(synth_image(seed + idx, w, h)))
    return frames


# --- actor-pool stages -----------------------------------------------------
# Large binary rows: batches stay SMALL (media batches are sized in bytes,
# not rows, at real payload sizes) and everything is Arrow in/out.


class ImageFeatures:
    """Actor: decode -> resize (nearest-neighbor kernel) -> channel stats.

    __init__ holds the (stub) codec + resize target — the expensive state
    a real deployment loads once per actor (codec contexts, a preprocessor
    model)."""

    def __init__(self, target: tuple[int, int] = (16, 16)):
        self.target = target

    def _resize(self, img: np.ndarray) -> np.ndarray:
        th, tw = self.target
        h, w = img.shape[:2]
        yi = (np.arange(th) * h // th).clip(0, h - 1)
        xi = (np.arange(tw) * w // tw).clip(0, w - 1)
        return img[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, stds, thumbs = [], [], [], []
        mask = [k == "image" for k in batch["kind"].to_pylist()]
        sub = batch.filter(pa.array(mask, pa.bool_()))
        for mid, payload in zip(sub["media_id"].to_pylist(), sub["payload"].to_pylist()):
            img = decode_image(payload)
            small = self._resize(img)
            ids.append(mid)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            thumbs.append(small.astype(np.uint8).tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "pix_mean": pa.array(means, pa.float64()),
                "pix_std": pa.array(stds, pa.float64()),
                "thumb": pa.array(thumbs, pa.binary()),
            }
        )


class AudioFeatures:
    """Actor: decode -> frame-wise RMS energy + zero-crossing rate."""

    def __init__(self, frame: int = 400):
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rms, zcr, secs = [], [], [], []
        mask = [k == "audio" for k in batch["kind"].to_pylist()]
        sub = batch.filter(pa.array(mask, pa.bool_()))
        for mid, payload in zip(sub["media_id"].to_pylist(), sub["payload"].to_pylist()):
            wave, rate = decode_audio(payload)
            n = len(wave) // self.frame * self.frame
            ids.append(mid)
            if n == 0:
                # clip shorter than one frame: RMS over the whole clip
                rms.append(float(np.sqrt((wave**2).mean())) if len(wave) else 0.0)
            else:
                frames = wave[:n].reshape(-1, self.frame)
                rms.append(float(np.sqrt((frames**2).mean(axis=1)).mean()))
            zcr.append(float((np.diff(np.sign(wave)) != 0).mean()))
            secs.append(len(wave) / rate)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
                "duration_s": pa.array(secs, pa.float64()),
            }
        )


class FrameSampler:
    """Actor: sample every k-th frame, emit one ROW PER FRAME (1->N)."""

    def __init__(self, every: int = 5):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, blobs = [], [], []
        mask = [k == "video" for k in batch["kind"].to_pylist()]
        sub = batch.filter(pa.array(mask, pa.bool_()))
        for mid, payload in zip(sub["media_id"].to_pylist(), sub["payload"].to_pylist()):
            for j, frame in enumerate(decode_video_frames(payload, self.every)):
                ids.append(mid)
                idxs.append(j * self.every)
                blobs.append(frame.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(blobs, pa.binary()),
            }
        )


def _pool_size() -> int:
    """Leave headroom for upstream task stages — an actor pool that
    reserves every CPU starves the read stage and the pipeline stalls."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, min(8, cpus - 2))


def media_dataset(sf_dir: str, kind: str | None = None):
    """``kind`` prunes BEFORE synthesis (kind is doc_id % 3): a per-kind
    feature pipeline never synthesizes or ships the other 2/3 of payload
    bytes."""
    import ray.data

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    if kind is not None:
        want = ("image", "audio", "video").index(kind)

        def prune(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 3 == want))

        docs = docs.map_batches(prune, batch_format="pyarrow")
    return docs.map_batches(synth_media_batch, batch_format="pyarrow")


def image_features(sf_dir: str):
    """Actor pool: codec state loaded once per actor; small batches because
    rows are payload-heavy."""
    return media_dataset(sf_dir, kind="image").map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=256, concurrency=_pool_size(), num_cpus=1
    )


def audio_features(sf_dir: str):
    return media_dataset(sf_dir, kind="audio").map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=256, concurrency=_pool_size(), num_cpus=1
    )


def video_frames(sf_dir: str, every: int = 5):
    return media_dataset(sf_dir, kind="video").map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every": every},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=_pool_size(),
        num_cpus=1,
    )


# --- trim-grid preview (reference M35, src/cli/preview_trim_grid.py) -------

TRIM_DIRECTIONS = (
    # (direction, label prefix, color) — the reference's color coding
    ("top", "T", "#FF0000"),
    ("bottom", "B", "#0000FF"),
    ("left", "L", "#00FF00"),
    ("right", "R", "#FFA500"),
)


def trim_ratios(step: float = 0.05, max_ratio: float = 0.30) -> list[float]:
    """The reference's ratio ladder (preview_trim_grid.py:136-141)
    REPLICATED INCLUDING its float accumulation: `ratio += step` compounds
    representation error, so with the defaults the ladder is
    [0.05, 0.1, 0.15000000000000002, 0.2, 0.25, 0.3] — the third rung is
    NOT the double nearest 0.15. The oracle embeds these exact doubles;
    "fixing" the loop to `step * i` would break parity with what the
    reference actually draws."""
    if step <= 0:
        raise ValueError("step must be greater than 0")
    if step > max_ratio:
        raise ValueError("step must be <= max")
    if max_ratio >= 0.5:
        raise ValueError("max must be < 0.5")
    ratios = []
    ratio = step
    while ratio <= max_ratio:
        ratios.append(ratio)
        ratio += step
    return ratios


def preview_trim_grid(sf_dir: str, step: float = 0.05, max_ratio: float = 0.30):
    """Data-engine analog of the reference trim-grid preview: instead of
    rasterizing guide lines onto PNGs (no PIL in this container), emit one
    row per (image, direction, ratio) carrying the exact geometry the
    reference would draw — pixel coordinate via the same int() truncation
    (preview_trim_grid.py:143-168), the "T:0.05"-style label, and the
    direction's color code. A real deployment feeds these rows to any
    renderer; the numbers, not the pixels, are the debug artifact."""
    import ray.data

    ratios = trim_ratios(step, max_ratio)

    def grid(batch: pa.Table) -> pa.Table:
        mask = [k == "image" for k in batch["kind"].to_pylist()]
        sub = batch.filter(pa.array(mask, pa.bool_()))
        ids, dirs, rs, pxs, labels, colors = [], [], [], [], [], []
        for mid, w, h in zip(
            sub["media_id"].to_pylist(),
            sub["meta_width"].to_pylist(),
            sub["meta_height"].to_pylist(),
        ):
            for direction, prefix, color in TRIM_DIRECTIONS:
                for ratio in ratios:
                    if direction == "top":
                        px = int(h * ratio)
                    elif direction == "bottom":
                        px = int(h * (1 - ratio))
                    elif direction == "left":
                        px = int(w * ratio)
                    else:
                        px = int(w * (1 - ratio))
                    ids.append(mid)
                    dirs.append(direction)
                    rs.append(ratio)
                    pxs.append(px)
                    labels.append(f"{prefix}:{ratio:.2f}")
                    colors.append(color)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "direction": pa.array(dirs, pa.string()),
                "ratio": pa.array(rs, pa.float64()),
                "px": pa.array(pxs, pa.int64()),
                "label": pa.array(labels, pa.string()),
                "color": pa.array(colors, pa.string()),
            }
        )

    return media_dataset(sf_dir, kind="image").map_batches(grid, batch_format="pyarrow")
