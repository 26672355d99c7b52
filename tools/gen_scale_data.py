"""Scale-curve test data (r9 verdict task 5): extend the driver's
sf0.1 tables to sf0.3 / sf1.0 under ``testdata_scale/`` so the slow
headline slots can be measured at >sf0.1 and a per-query scaling
exponent recorded in SCALE.md.

/root/testdata is read-only and the driver's generator is not
available, so the extension REPLICATES sf0.1 with distribution-
preserving reindexing (pure timing data — no oracle ever runs here):

- dimensions (region nation customer supplier part): copied verbatim
  (TPC-H scales them sublinearly; the slow slots don't scan them).
- orders + lineitem: K copies with o_orderkey/l_orderkey offset by a
  shared keyspan — join fan-in, key cardinality ratios, and value
  distributions are preserved exactly.
- events: K copies with event_id offset; ts/user_id kept (per-hour and
  per-user densities scale with sf, as a real stream would).
- documents: K copies with doc_id offset; copy k>0 PERMUTES each
  text's word sequence with a copy-seeded deterministic shuffle —
  identical unigram statistics and length, disjoint shingle sets.
  (r11 fix: the r10 ROTATION preserved the n-gram multiset except at
  the cut point, so every copy was a ~Jaccard-1 near-duplicate of its
  source and pair-generating slots went quadratic in K — measured
  ngram_jaccard_pairs α=1.38 and a 732 s corpus_build cold at sf1.0,
  pure fixture artifact. A permutation keeps the dup RATE constant
  with sf — organic within-copy dups ×K — which is the property the
  timing fixture needs.)
- embeddings: K copies with vec_id offset; copy k>0 draws fresh
  seeded unit vectors (the sf0.1 table is i.i.d. unit vectors; new
  draws preserve that geometry, clones would not).

Run: python tools/gen_scale_data.py [K] [out_dir]  (default K=3 →
sf0.3 at testdata_scale/sf0.3). Deterministic: seed fixed per copy.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DIMS = ("region", "nation", "customer", "supplier", "part")


def main() -> int:
    k_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = round(0.1 * k_copies, 1)
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "testdata_scale", f"sf{sf}")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in DIMS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    # SELECT * REPLACE keeps the FULL source schema (ADVICE r10: a
    # hand-listed projection silently narrows the copies, and any
    # scale_curve query touching a dropped column would fail or
    # mis-time at sf0.3/1.0 only)
    okeys = con.sql(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    copies = " UNION ALL ".join(
        f"SELECT * REPLACE (o_orderkey + {k * okeys} AS o_orderkey)"
        f" FROM '{SRC}/orders.parquet'"
        for k in range(k_copies)
    )
    con.sql(f"COPY ({copies}) TO '{out}/orders.parquet' (FORMAT PARQUET)")

    copies = " UNION ALL ".join(
        f"SELECT * REPLACE (l_orderkey + {k * okeys} AS l_orderkey)"
        f" FROM '{SRC}/lineitem.parquet'"
        for k in range(k_copies)
    )
    con.sql(f"COPY ({copies}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")

    ekeys = con.sql(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
    copies = " UNION ALL ".join(
        f"SELECT * REPLACE (event_id + {k * ekeys} AS event_id)"
        f" FROM '{SRC}/events.parquet'"
        for k in range(k_copies)
    )
    con.sql(f"COPY ({copies}) TO '{out}/events.parquet' (FORMAT PARQUET)")

    dkeys = con.sql(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    parts = []
    for k in range(k_copies):
        if k == 0:
            parts.append(f"SELECT * FROM '{SRC}/documents.parquet'")
        else:
            # copy-seeded deterministic word permutation: order the
            # positions by hash(position, k) — same words, same
            # length, no shared shingles with any other copy (and no
            # exact clone at ANY length, closing ADVICE r10's
            # short-doc hole along the way)
            perm = (
                f"list_select(words, list_grade_up(list_transform("
                f"generate_series(1, len(words)),"
                f" i -> hash(i * 1000003 + {k}))))"
            )
            parts.append(
                f"SELECT * EXCLUDE (words) REPLACE"
                f" (doc_id + {k * dkeys} AS doc_id,"
                f" array_to_string({perm}, ' ') AS text)"
                f" FROM (SELECT *, string_split(text, ' ') AS words"
                f"       FROM '{SRC}/documents.parquet')"
            )
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    vrows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    n, dim = len(vrows), len(vrows[0][1])
    vkeys = max(r[0] for r in vrows) + 1
    ids, embs, labs = [], [], []
    for k in range(k_copies):
        if k == 0:
            for vid, emb, lab in vrows:
                ids.append(vid); embs.append(list(emb)); labs.append(lab)
        else:
            rng = np.random.RandomState(1000 + k)
            mat = rng.standard_normal((n, dim))
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat.astype(np.float32)
            for i, (vid, _e, lab) in enumerate(vrows):
                ids.append(vid + k * vkeys); embs.append(mat[i].tolist()); labs.append(lab)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labs, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")

    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        c = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, c)
    print("written:", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
