#!/usr/bin/env python
"""Regenerate the dedup_minhash_arith_survivors oracle SQL from the
arith_hash_family coefficients (single source of truth in
tubes_spark/operators/dedup.py).  Prints the ORACLES assignment block;
paste it over the existing one in tubes_spark/oracles.py if the family
(k, bands, seed) ever changes."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tubes_spark.operators.dedup import ARITH_P, arith_hash_family

K, BANDS = 16, 8
ROWS = K // BANDS


def main() -> None:
    fam = arith_hash_family(K)
    mins = ",\n    ".join(
        f"min(({a}*x + {b}) % {ARITH_P}) AS m{i}" for i, (a, b) in enumerate(fam)
    )
    bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {bnd} AS band, "
        + " || '_' || ".join(f"CAST(m{bnd * ROWS + r} AS VARCHAR)" for r in range(ROWS))
        + " AS key FROM m"
        for bnd in range(BANDS)
    )
    print(
        f'''ORACLES["dedup_minhash_arith_survivors"] = f"""
WITH hx AS (
  SELECT doc_id, CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) % {ARITH_P} AS x
  FROM (SELECT doc_id, unnest(list_distinct({{_SHINGLES}})) AS s FROM documents)
), m AS (
  SELECT doc_id,
    {mins}
  FROM hx GROUP BY doc_id
), bands AS (
{bands}
), dropped AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY band, key) AS mn FROM bands
  ) WHERE doc_id > mn
)
SELECT d.doc_id, d.source, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""'''
    )


if __name__ == "__main__":
    main()
