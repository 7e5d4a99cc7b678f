"""Per-image archive artifacts — parity with the reference's encode output.

The reference writes one tar.gz/zip per image: JPEG leaf blocks at paths
``"0/3/1"`` derived from tile ids, pseudo-symlinks (path-string file bodies)
for deduplicated blocks, and a 3-line ``meta`` file
(``pkg/quadtreeImage/archive.go:52-128``, ``quadtreeElement.go:238-276``,
``quadtreeImage.go:134-143``).

In this engine the blocks *table* is the archive of record (SURVEY.md §2.1
S3) — but the per-image artifact is still useful as an interchange/demo
format, so it's implemented as a grouped Arrow UDF producing one
``(image_id, archive binary)`` row per image, and a scan that turns archives
back into block rows. Both of the reference's wire formats are supported
(``ArchiveMode`` gzip|zip, ``archive.go:19-23``): ``"gzip"`` — the
reference's DEFAULT (``configs/config.yml:17``) — is tar-chained-into-gzip
exactly like ``NewArchiveWriter``'s gzip branch (``archive.go:52-67``),
via stdlib ``tarfile``/``gzip``; ``"zip"`` via stdlib ``zipfile``. The
reader never takes a format argument: like ``OpenArchiveReader``
(``archive.go:141-186``) it sniffs the container magic bytes and eagerly
caches every member (``populateFileCacheGzip`` ``archive.go:198-225``).

Format notes:
* member path = ``"/".join(tile_id)`` (root leaf = ``"root"`` since the
  reference's root path would be the empty string);
* dedup'd members hold the canonical member's path as UTF-8 text (the
  pseudo-symlink), detected on read by failing magic-byte sniff — exactly
  the reference's detection rule (``quadtreeElement.go:291``);
* ``meta`` = ``"<tree_height>\\n<width>\\n<height>"``.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

from pyspark.sql import DataFrame, functions as F

from ..config import EngineConfig, DEFAULT_CONFIG

ARCHIVES_SCHEMA = "image_id string, archive binary, n_members int"

_GZIP_MAGIC = b"\x1f\x8b"
_ZIP_MAGIC = b"PK"


def _tile_to_path(tile_id: str) -> str:
    return "/".join(tile_id) if tile_id else "root"


def _path_to_tile(path: str) -> str:
    return "" if path == "root" else path.replace("/", "")


def _pack_members(members: list[tuple[str, bytes]], fmt: str) -> bytes:
    """Container-serialize (path, body) members. ``"gzip"`` chains a tar
    writer into a gzip writer (reference ``archive.go:58-61``) with
    deterministic headers (mtime 0, zeroed owner) so identical blocks give
    identical archive bytes; ``"zip"`` is deflate, like the r1-r3 tier."""
    buf = io.BytesIO()
    if fmt == "gzip":
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz, \
                tarfile.open(fileobj=gz, mode="w") as tf:
            for path, body in members:
                info = tarfile.TarInfo(name=path)
                info.size = len(body)
                info.mode = 0o544  # reference writes bare-bones mode 544
                info.mtime = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(body))
    elif fmt == "zip":
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            for path, body in members:
                z.writestr(path, body)
    else:
        raise ValueError(f"unknown archive format {fmt!r} (gzip|zip)")
    return buf.getvalue()


def _unpack_members(data: bytes) -> dict[str, bytes]:
    """Sniff the container by magic bytes (the reference infers the mode
    from content, never the filename — ``archive.go:152-156``) and eagerly
    cache all members."""
    if data[:2] == _GZIP_MAGIC:
        with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tf:
            return {m.name: tf.extractfile(m).read()
                    for m in tf.getmembers() if m.isreg()}
    if data[:2] == _ZIP_MAGIC:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            return {n: z.read(n) for n in z.namelist()}
    raise ValueError("unrecognized archive container (not gzip or zip)")


def write_archives(blocks: DataFrame, images_meta: DataFrame,
                   cfg: EngineConfig = DEFAULT_CONFIG,
                   skip_oob: bool = False, codec: str = "jfif",
                   fmt: str | None = None) -> DataFrame:
    """Leaf blocks → one archive per image (``fmt``: gzip|zip; default from
    ``cfg.encoding.archive_format``, which mirrors the reference's
    ``ArchiveFormat: gzip`` default).

    ``images_meta``: (image_id, w, h). Exact duplicate blocks within an
    image are stored once; later occurrences become pseudo-symlinks, like
    the reference's imagePaths map (``quadtreeElement.go:249-261``).

    ``codec``: ``"jfif"`` (default) writes REAL baseline JPEG members —
    wire-compatible with the reference's stdlib-JPEG archives
    (``quadtreeElement.go:254``); ``"jpeg"`` writes the fast vectorized QJX
    DCT stand-in (same loss model, not wire-JPEG).
    """
    quality = cfg.encoding.block_quality
    fmt = fmt or cfg.encoding.archive_format
    if fmt not in ("gzip", "zip"):
        raise ValueError(f"unknown archive format {fmt!r} (gzip|zip)")
    leaves = (blocks.filter(F.col("is_leaf"))
              .filter(~(F.lit(bool(skip_oob)) & F.col("oob")))
              .select("image_id", "tile_id", "level", "block_px", "block_hash"))
    joined = leaves.join(images_meta.select("image_id", "w", "h"), "image_id")

    def build(pdf):
        import numpy as np
        import pandas as pd
        from ..kernels.codecs import encode_image
        from ..kernels.tiles import tree_height

        image_id = pdf["image_id"].iloc[0]
        w = int(pdf["w"].iloc[0]); h = int(pdf["h"].iloc[0])
        seen: dict[int, str] = {}
        pdf = pdf.sort_values("tile_id")
        members = [("meta", f"{tree_height(w, h)}\n{w}\n{h}".encode())]
        for tid, px, bh in zip(pdf["tile_id"], pdf["block_px"], pdf["block_hash"]):
            path = _tile_to_path(tid)
            if bh in seen:  # pseudo-symlink: body is the canonical path
                members.append((path, seen[bh].encode()))
            else:
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(8, 8, 3)
                members.append((path, encode_image(arr, codec, quality)))
                seen[bh] = path
        return pd.DataFrame([{"image_id": image_id,
                              "archive": _pack_members(members, fmt),
                              "n_members": len(members)}])

    return joined.groupBy("image_id").applyInPandas(build, ARCHIVES_SCHEMA)


DECODED_SCHEMA = ("image_id string, tile_id string, block_px binary, "
                  "is_symlink boolean, w int, h int, tree_height int")


def read_archives(archives: DataFrame) -> DataFrame:
    """Archives → block rows (the reference's decode-side file cache +
    symlink-follow, ``archive.go:131-248`` / ``quadtreeElement.go:279-310``,
    as a flat mapInPandas). Container format (gzip or zip) is sniffed per
    archive from magic bytes, like ``OpenArchiveReader``."""

    def parse(batches):
        import pandas as pd
        from ..kernels.codecs import (decode_image, JPEG_SIG, PNG_SIG,
                                      QJX_SIG, RAW_SIG)

        for pdf in batches:
            out = []
            for image_id, data in zip(pdf["image_id"], pdf["archive"]):
                members = _unpack_members(bytes(data))  # eager cache
                meta = members.pop("meta").decode().split("\n")
                if len(meta) != 3:
                    raise ValueError(f"malformed meta in {image_id}")
                th, w, h = (int(v) for v in meta)
                for path, body in members.items():
                    # the reference's symlink-detection rule: a member that
                    # fails the image magic sniff is a path string
                    is_link = not (body[:4] in (QJX_SIG, RAW_SIG)
                                   or body[:8] == PNG_SIG
                                   or body[:2] == JPEG_SIG)
                    if is_link:  # follow pseudo-symlink
                        body = members[body.decode()]
                    px = decode_image(body)
                    out.append((image_id, _path_to_tile(path),
                                px.astype("uint8").tobytes(), bool(is_link),
                                w, h, th))
            yield pd.DataFrame(out, columns=["image_id", "tile_id", "block_px",
                                             "is_symlink", "w", "h", "tree_height"])

    return archives.select("image_id", "archive").mapInPandas(parse, DECODED_SCHEMA)
