"""geobuf_ray — a Ray-Data-native spatial data-processing engine.

From-scratch reimplementation of the capabilities of murphy214/geobuf
(varint delta-encoded geometry codec, streaming geobuf files, tile
split/combine) as vectorized Arrow batch kernels and Ray Data pipeline
stages, plus an H3/S2-style cell-indexed spatial-join + tiling engine
and large-scale training-data operators (dedup, ANN, text analysis,
image tables).  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
