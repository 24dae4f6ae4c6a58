"""Generate the hot-key skew replica for the scale-proof (VERDICT r4 #6):
a copy of an events table where ONE user owns ~10% of ALL events — the
adversarial regime for every per-user operator (CDC collapse, funnel,
sequences). Deterministic: events with event_id % 10 == 7 are reassigned
to the corpus's smallest user_id; everything else (ts, type, value,
props) is untouched, so totals and calendar shape survive and only the
key distribution changes. Other tables are hard-copied so the dir is a
drop-in sf_dir.

Usage: python tools/make_skew.py [src_dir] [dst_dir]
       (defaults /tmp/sf1 -> /tmp/sf1_skew)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_skew"

TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    hot = con.execute(
        f"SELECT min(user_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT event_id, ts,
                 CASE WHEN event_id % 10 = 7 THEN {hot} ELSE user_id END AS user_id,
                 event_type, value, props
          FROM read_parquet('{SRC}/events.parquet')
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, f"{DST}/{t}.parquet")
    stats = con.execute(
        f"""
        WITH pu AS (SELECT user_id, count(*) AS n
                    FROM read_parquet('{DST}/events.parquet') GROUP BY user_id)
        SELECT (SELECT n FROM pu WHERE user_id = {hot}) AS hot_n,
               sum(n) AS total, count(*) AS n_users FROM pu
        """
    ).fetchone()
    print(
        f"wrote {DST}: hot user {hot} owns {stats[0]:,}/{stats[1]:,} events "
        f"({100.0 * stats[0] / stats[1]:.1f}%) across {stats[2]:,} users"
    )


if __name__ == "__main__":
    main()
