"""Repaired reference kernel — the semantics oracle (KERNEL_SPEC.md).

Pure Python, no Spark imports. Generates golden fixtures the Spark
pipeline is byte-compared against.
"""

from .extract import content_hash, extract_document

__all__ = ["extract_document", "content_hash"]
