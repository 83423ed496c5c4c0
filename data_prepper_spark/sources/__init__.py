"""Source / codec equivalents (reference: §2.1 sources, §2.2 codecs).

The reference's sources are protocol servers + object scanners feeding a
buffer; in Spark the scan IS the source.  This module maps each codec to
the corresponding reader and adds the reference's newline/header
semantics where Spark's defaults differ.
"""

from .codecs import (  # noqa: F401
    read_avro,
    read_csv,
    read_json_array,
    read_ndjson,
    read_newline,
    read_parquet,
    write_avro,
    write_csv,
    write_ndjson,
    write_parquet,
)
