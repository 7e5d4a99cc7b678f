"""Deterministic synthetic ``images`` table (FIXTURES.md §1).

Schema is exactly the BASELINE.json ``input_hint`` shape:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``. Generation is seeded pure-numpy so tables are
byte-reproducible across runs and parallelism levels — the determinism the
north rule requires. Pixel-content classes each exercise a specific
reference code path (solid → root collapse; checker_1 → max-depth tree, cf.
the adversarial 8×8 search in
``cmd/tools/imageGenerator/imageGenerator.go:99-144``; halfplane → unbalanced
depth; dup_blocks → the dedup path ``quadtreeElement.go:176-221``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                 "caption string, phash long")

_SIZES = [1, 7, 8, 9, 16, 33, 64, 100, 128, 250, 512]
_CLASSES = ["solid", "gradient", "checker_1", "checker_2", "checker_4",
            "checker_8", "halfplane", "noise", "dup_blocks"]
_CAPTIONS = ["", "a solid block", "grüne Fläche ✓", "棋盘图案", "noise — σ=1.0",
             "half plane / détail", "duplicated 8×8 tiles", "gradient ramp",
             "エッジケース", "padding-heavy tile"]


def _pixels(cls: str, w: int, h: int, rng: np.random.Generator) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    if cls == "solid":
        color = rng.integers(0, 256, 3)
        img = np.broadcast_to(color, (h, w, 3)).astype(np.uint8)
    elif cls == "gradient":
        r = (xx * 255 // max(w - 1, 1))
        g = (yy * 255 // max(h - 1, 1))
        b = ((xx + yy) * 255 // max(w + h - 2, 1))
        img = np.stack([r, g, b], axis=-1).astype(np.uint8)
    elif cls.startswith("checker_"):
        k = int(cls.split("_")[1])
        c0 = rng.integers(0, 256, 3)
        c1 = rng.integers(0, 256, 3)
        mask = ((xx // k + yy // k) % 2).astype(bool)
        img = np.where(mask[..., None], c1, c0).astype(np.uint8)
    elif cls == "halfplane":
        img = np.full((h, w, 3), 200, dtype=np.uint8)
        qh, qw = max(h // 2, 1), max(w // 2, 1)
        img[:qh, :qw] = rng.integers(0, 256, (qh, qw, 3), dtype=np.int64).astype(np.uint8)
    elif cls == "noise":
        img = rng.integers(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
    elif cls == "dup_blocks":
        pool = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.int64).astype(np.uint8)
        th, tw = (h + 7) // 8, (w + 7) // 8
        picks = rng.integers(0, 3, (th, tw))
        big = pool[picks].transpose(0, 2, 1, 3, 4).reshape(th * 8, tw * 8, 3)
        img = np.ascontiguousarray(big[:h, :w])
    else:
        raise ValueError(cls)
    return np.ascontiguousarray(img)


def _row_draws(i: int, seed: int, max_side: int):
    """THE per-row draw sequence — the single definition of row ``i``'s
    private RNG stream and its first draws (class, w, h, caption). Every
    generator (pandas, distributed, metadata-only) replays exactly this,
    so a change to the draw order cannot drift between them. Returns
    (rng, cls, w, h, caption); callers draw pixels from ``rng`` next."""
    sizes = [s for s in _SIZES if s <= max_side]
    rng = np.random.default_rng(seed * 1_000_003 + i)  # per-row stream -> order-independent
    cls = _CLASSES[i % len(_CLASSES)]
    w = int(sizes[int(rng.integers(0, len(sizes)))])
    h = int(sizes[int(rng.integers(0, len(sizes)))])
    caption = f"{_CAPTIONS[i % len(_CAPTIONS)]} [{cls}#{i}]"
    return rng, cls, w, h, caption


def images_pandas(n_rows: int, seed: int = 42, fmt_cycle: tuple[str, ...] = ("png", "jpeg", "raw"),
                  max_side: int = 512) -> pd.DataFrame:
    """Generate ``n_rows`` deterministic image rows as a pandas DataFrame."""
    from ..kernels.codecs import encode_image
    from ..kernels.phash import phash64

    rows = []
    for i in range(n_rows):
        rng, cls, w, h, caption = _row_draws(i, seed, max_side)
        fmt = fmt_cycle[i % len(fmt_cycle)]
        img = _pixels(cls, w, h, rng)
        rows.append({
            "image_id": f"img_{i:08d}",
            "bytes": encode_image(img, fmt),
            "w": w, "h": h, "fmt": fmt,
            "caption": caption,
            "phash": int(phash64(img)),
        })
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype("int32")
    df["h"] = df["h"].astype("int32")
    df["phash"] = df["phash"].astype("int64")
    return df


def images_meta_pandas(n_rows: int, seed: int = 42,
                       max_side: int = 512) -> pd.DataFrame:
    """Metadata-only fixture view: (image_id, w, h, caption) for the first
    ``n_rows`` fixture images WITHOUT synthesizing or encoding any pixels
    (ADVICE r3: oracle-side dims must not run the pixel kernel). The sizes
    come from :func:`_row_draws`, the single shared definition of the
    per-row stream (pinned by a fixture test)."""
    rows = []
    for i in range(n_rows):
        _rng, _cls, w, h, caption = _row_draws(i, seed, max_side)
        rows.append({"image_id": f"img_{i:08d}", "w": w, "h": h,
                     "caption": caption})
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype("int32")
    df["h"] = df["h"].astype("int32")
    return df


def generate_images(spark, n_rows: int, seed: int = 42, partitions: int | None = None,
                    max_side: int = 512):
    """Distributed deterministic generation: the seed stream is per-row, so
    rows can be produced independently inside ``mapInPandas`` on executors —
    no driver-side materialization at large n."""
    from pyspark.sql import functions as F

    parts = partitions or max(1, n_rows // 64)
    idx = spark.range(0, n_rows, 1, parts)

    def gen(batches):
        from ..kernels.codecs import encode_image
        from ..kernels.phash import phash64
        for pdf in batches:
            out = []
            for i in pdf["id"].tolist():
                rng, cls, w, h, caption = _row_draws(i, seed, max_side)
                fmt = ("png", "jpeg", "raw")[i % 3]
                img = _pixels(cls, w, h, rng)
                out.append((f"img_{i:08d}", encode_image(img, fmt), w, h, fmt,
                            caption, int(phash64(img))))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h",
                                             "fmt", "caption", "phash"])

    df = idx.mapInPandas(gen, schema=IMAGES_SCHEMA)
    return df.withColumn("w", F.col("w").cast("int")).withColumn("h", F.col("h").cast("int"))
