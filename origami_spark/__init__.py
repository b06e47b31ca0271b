"""origami_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the computational semantics of
poke1024/origami's batch pipeline (page segmentation / separator detection /
XY-cut reading order / compose), re-expressed for Common-Crawl-style web
pages:

* origami's pixel segmentation  -> DOM-node labeling         (kernels/segment.py)
* raster->vector contours       -> DOM block extraction      (kernels/blocks.py)
* flow/dewarp numeric kernel    -> byte-stream tokenizer +
                                   per-block feature columns (kernels/features.py)
* layout rule pipeline          -> relational span algebra   (operators/layout.py)
* XY-cut reading order          -> deterministic block order (operators/order.py)
* OCR + compose                 -> normalization + assembly  (operators/compose.py)

Everything relational runs through the DataFrame API so Catalyst optimizes
it; domain logic runs in Arrow-batched kernels (mapInPandas) with zero
per-row Python UDFs.  See SURVEY.md for the operator-by-operator mapping
with reference file:line citations.
"""

__version__ = "0.1.0"
