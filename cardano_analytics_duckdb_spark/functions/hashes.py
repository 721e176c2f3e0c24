"""Hash helpers.

``blake2b_256_udf`` is the one scalar function the reference needs that
Spark has no JVM builtin for (Spark ships sha1/sha2/md5/crc32/xxhash64
only) — ≙ the inline-datum hashing at /root/reference/ogmios_parquet.py:333-343.
Arrow-vectorized pandas UDF; it only runs on datum rows, so it's off the
hot path (SURVEY §7.4).

Shipped as a factory returning a *locally defined* function so cloudpickle
serializes it by value: Python workers must not need this package on their
import path (the driver may run from any cwd with the repo only on the
driver's sys.path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def blake2b_256_udf() -> "F.pandas_udf":
    def _blake(data):
        import hashlib

        return data.map(
            lambda b: None
            if b is None
            else hashlib.blake2b(bytes(b), digest_size=32).digest()
        )

    return F.pandas_udf(_blake, T.BinaryType())


def blake2b_256(col: Column) -> Column:
    return blake2b_256_udf()(col)
