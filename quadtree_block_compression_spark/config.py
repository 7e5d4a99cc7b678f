"""Engine configuration.

Mirrors the reference's YAML config surface (``pkg/config/config.go:9-55``,
defaults ``configs/config.yml:1-33``) as a plain dataclass. Spark-level knobs
(parallelism booleans in the reference, ``config.go:33-34,41``) are replaced
by ordinary Spark configuration — partition counts, AQE — set in
:mod:`.session`.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class QuadtreeConfig:
    # reference: configs/config.yml:4 (SimilarityCutoff: 0.9)
    similarity_cutoff: float = 0.9
    # reference: configs/config.yml:6-8 (defaults that matter: NN down, CatmullRom up)
    downsampling_interpolator: str = "NearestNeighbor"
    upsampling_interpolator: str = "CatmullRom"


@dataclass(frozen=True)
class EncodingConfig:
    # reference: configs/config.yml:10-27
    skip_out_of_bounds_blocks: bool = False
    deduplicate_blocks: bool = False
    dedup_minimal_similarity: float = 0.9
    # our lossy block codec quality (reference uses Go jpeg default 75,
    # pkg/quadtreeImage/quadtreeElement.go:254)
    block_quality: int = 75
    # per-image archive container: "gzip" (tar.gz — the reference's
    # default, configs/config.yml:13) or "zip" (archive.go:19-23)
    archive_format: str = "gzip"


@dataclass(frozen=True)
class SpatialConfig:
    # Z-order cell resolution (bits per axis) used for cell keys — the
    # pure-numpy stand-in for H3/S2 cells (SURVEY.md §2.12).
    cell_resolution: int = 8
    # candidate-count threshold marking a cell "hot" for salted joins
    hot_cell_threshold: int = 10_000
    salt_factor: int = 8


@dataclass(frozen=True)
class EngineConfig:
    quadtree: QuadtreeConfig = field(default_factory=QuadtreeConfig)
    encoding: EncodingConfig = field(default_factory=EncodingConfig)
    spatial: SpatialConfig = field(default_factory=SpatialConfig)


DEFAULT_CONFIG = EngineConfig()
