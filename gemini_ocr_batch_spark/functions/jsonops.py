"""JSON decode/rescue functions — the reference's response-decoding chain
re-expressed as column expressions.

The reference decodes LLM responses through: nested JSON path extraction
(reference: src/results.py:42-54), code-fence stripping (reference:
src/results.py:58-66), brace-window rescue parse (reference:
src/results.py:73-78), and schema validation where a parse failure becomes
a typed error row rather than a crash (reference: src/results.py:69,156).
Each maps to a built-in, codegen'd expression here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# F6: strip a leading/trailing markdown code fence (``` or ```lang)
_FENCE_RE = r"(?s)^```[a-zA-Z]*\n(.*)\n```$"


def strip_code_fence(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _FENCE_RE, "$1")


# F7: brace-window rescue — substring from first '{' to last '}'
def brace_rescue(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    start = F.instr(c, "{")
    # locate last '}' via reversed search (instr finds first occurrence)
    rev_pos = F.instr(F.reverse(c), "}")
    end = F.length(c) - rev_pos + 1
    return F.when(
        (start > 0) & (rev_pos > 0) & (end >= start),
        F.substring(c, start, end - start + 1),
    ).otherwise(F.lit(None).cast("string"))


# F8: parse + validate — null result ≙ the reference's ValidationError
def parse_validated(col: Column | str, schema: T.StructType | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


# F9: nested JSON path extraction
def json_path(col: Column | str, path: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)
