"""Scalar/aggregate function surface mirroring the reference's func/ package.

The reference registers most of these as per-row Python functions inside
SQLite (/root/reference/src/datachain/sql/sqlite/base.py:233-316); here
every function is a Catalyst expression (JVM, codegen). Names and
signatures follow /root/reference/src/datachain/func/*.
"""

from datachain_spark.functions import random
from datachain_spark.functions.string import (
    byte_hamming_distance,
    length,
    regexp_replace,
    replace,
    split,
)
from datachain_spark.functions.path import file_ext, file_stem, name, parent
from datachain_spark.functions.array import (
    contains,
    cosine_distance,
    euclidean_distance,
    get_element,
    join,
    sip_hash_64,
    slice,
)
from datachain_spark.functions.numeric import (
    bit_and,
    bit_hamming_distance,
    bit_or,
    bit_xor,
    int_hash_64,
)
from datachain_spark.functions.conditional import (
    and_,
    case,
    greatest,
    ifelse,
    isnone,
    least,
    not_,
    or_,
)
from datachain_spark.functions.aggregate import (
    any_value,
    avg,
    collect,
    concat,
    count,
    dense_rank,
    first,
    max,
    min,
    rank,
    row_number,
    sum,
    window,
)
from pyspark.sql.functions import lit as literal, rand

__all__ = [
    "length", "split", "replace", "regexp_replace", "byte_hamming_distance",
    "parent", "name", "file_stem", "file_ext",
    "cosine_distance", "euclidean_distance", "contains", "slice", "join",
    "get_element", "sip_hash_64",
    "bit_and", "bit_or", "bit_xor", "int_hash_64", "bit_hamming_distance",
    "greatest", "least", "case", "ifelse", "isnone", "or_", "and_", "not_",
    "count", "sum", "avg", "min", "max", "any_value", "collect", "concat",
    "row_number", "rank", "dense_rank", "first", "window",
    "literal", "rand", "random",
]
