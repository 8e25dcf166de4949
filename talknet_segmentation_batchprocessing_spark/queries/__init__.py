"""Oracle-checked query inventory.

Each module registers named queries into ``..registry.REGISTRY``; every
query is the relational core of a SURVEY.md §2 operator, phrased over
the driver's synthetic tables (TESTDATA.md) with a DuckDB oracle that
must hash-match (row count + schema + values).

Conventions shared by Spark query and oracle:
- identical aliases on every computed column;
- double aggregates rounded in-query (both sides) so FP summation order
  can't flip hash bits;
- every ranking/limit carries a deterministic tie-break key.
"""
