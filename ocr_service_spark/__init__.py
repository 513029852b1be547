"""ocr_service_spark — a PySpark-native batch extraction engine.

A from-scratch reimplementation of the *computation* performed by the
reference OCR microservice stack (nowhere-team/ocr-service): per-document
span extraction over interleaved text/html/pdf/media documents, expressed
as declarative DataFrame plans plus Arrow-batched pandas kernels.

Design stance (SURVEY.md §7): one spark-submit job; DataFrame ops +
``mapInPandas`` kernels; columnar tables in/out (parquet locally, Iceberg
on a cluster); no service processes, no queues, no base64 hops.
"""

__version__ = "0.1.0"
