"""Adversarial fixture slice for the oracle-parity sweep (VERDICT r4 #7).

The driver fixtures are deterministic and benign; every divergence
class lives in the corners they never visit. This writes a tiny sf dir
(same 10 tables, same parquet logical types) where every corner is
occupied:

- events: NaN / +-Inf / NULL values, NULL ts, empty-string and unicode
  event types, a one-row event type, heavy user skew, timestamp ties,
  value exactly at the 15.0 delay threshold (> is strict), huge and
  negative magnitudes.
- documents: an all-duplicate block, empty/whitespace/1-char texts, a
  10k-char text, unicode text, a single-doc language, ties in n_chars.
- embeddings: dense vec_ids (the stride-init precondition), a zero
  vector (cosine's 0/0 corner), an identical-vector pair, +-1e30
  components, all labels present.
- orders/lineitem/customer/supplier/part: 1-line orders, a customer
  owning 20% of all orders (skew), customers with zero orders,
  negative balances, identical prices (rank ties), discount 0 and max,
  same-day date ties.
- region/nation: the standard 5/25 (queries filter on region names).

Usage:  python tools/gen_adversarial.py [out_dir]   (default
/tmp/advfix). Then:  python tools/parity.py /tmp/advfix
"""

from __future__ import annotations

import math
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/advfix"

US = "us"


def write(name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def ts(s: int) -> int:
    """Microseconds since epoch for 2024-01-01T00:00:00 + s seconds."""
    return (1_704_067_200 + s) * 1_000_000


def main() -> None:
    import os

    os.makedirs(OUT, exist_ok=True)

    # ------------------------------------------------------------- events
    n = 2000
    event_ids, tss, users, types, values, props = [], [], [], [], [], []
    base_types = ["view", "click", "purchase", "error", "signup"]
    for i in range(n):
        event_ids.append(i)
        # ties: groups of 10 share one timestamp; a few NULL ts
        tss.append(None if i % 500 == 499 else ts((i // 10) * 60))
        # skew: user 0 owns ~30% of all events
        users.append(0 if i % 10 < 3 else (i * 7919) % 50)
        if i == 0:
            types.append("")  # empty string type
        elif i == 1:
            types.append("クリック")  # unicode type (one-row group)
        else:
            types.append(base_types[i % len(base_types)])
        if i % 701 == 700:
            values.append(float("nan"))
        elif i % 811 == 810:
            values.append(float("inf"))
        elif i % 907 == 906:
            values.append(float("-inf"))
        elif i % 97 == 96:
            values.append(None)
        elif i % 53 == 52:
            values.append(15.0)  # exactly at the delay threshold
        elif i % 59 == 58:
            values.append(-1e15)
        else:
            values.append(round((i * 37 % 400) / 10.0, 2))
        props.append(None if i % 113 == 112 else '{"k": %d}' % (i % 100))
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(event_ids, pa.int64()),
                "ts": pa.array(tss, pa.timestamp(US)),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
    )

    # ---------------------------------------------------------- documents
    docs = []
    langs = ["en", "de", "fr", "es", "zh"]
    for i in range(300):
        if i < 40:  # all-duplicate block
            text = "dup dup dup the same text every time"
        elif i == 40:
            text = ""
        elif i == 41:
            text = " "
        elif i == 42:
            text = "x"
        elif i == 43:
            text = "word " * 2000  # 10k chars
        elif i == 44:
            text = "日本語 テキスト 重複 なし こんにちは 世界"
        else:
            words = [
                ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"][
                    (i * 31 + j) % 6
                ]
                + str((i * 17 + j * 13) % 50)
                for j in range(5 + (i * 29) % 40)
            ]
            text = " ".join(words)
        lang = "xx" if i == 45 else langs[i % len(langs)]
        docs.append((i, text, lang, f"src{i % 20}", len(text)))
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
                "lang": pa.array([d[2] for d in docs], pa.string()),
                "source": pa.array([d[3] for d in docs], pa.string()),
                "n_chars": pa.array([d[4] for d in docs], pa.int64()),
            }
        ),
    )

    # --------------------------------------------------------- embeddings
    dim, nvec = 64, 120
    vecs, labels = [], []
    for i in range(nvec):
        if i == 20:
            v = [0.0] * dim  # zero vector: cosine 0/0
        elif i == 21:
            v = [((7 * d + 3) % 19 - 9) / 9.0 for d in range(dim)]
        elif i == 22:
            v = [((7 * d + 3) % 19 - 9) / 9.0 for d in range(dim)]  # dup of 21
        elif i == 23:
            v = [1e30 if d == 0 else -1e30 if d == 1 else 0.0 for d in range(dim)]
        else:
            v = [
                math.sin(i * 0.7 + d * 0.31) * (1.0 + (i % 5) * 0.2)
                for d in range(dim)
            ]
        vecs.append([float(x) for x in v])
        labels.append(i % 10)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(nvec), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )

    # ------------------------------------------------------ region/nation
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    # ----------------------------------------------------------- customer
    nc = 200
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(nc), pa.int64()),
                "c_name": pa.array([f"Customer#{i}" for i in range(nc)]),
                "c_nationkey": pa.array([i % 25 for i in range(nc)], pa.int32()),
                # negative, zero, tied, and huge balances
                "c_acctbal": pa.array(
                    [
                        -999.99
                        if i % 7 == 0
                        else 0.0
                        if i % 7 == 1
                        else 5000.0  # massive tie block
                        if i % 7 in (2, 3)
                        else round(i * 13.37 % 9000, 2)
                        for i in range(nc)
                    ],
                    pa.float64(),
                ),
                "c_mktsegment": pa.array(
                    [
                        ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
                         "FURNITURE"][i % 5]
                        for i in range(nc)
                    ]
                ),
            }
        ),
    )

    # ----------------------------------------------------------- supplier
    ns = 50
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(ns), pa.int64()),
                "s_name": pa.array([f"Supplier#{i}" for i in range(ns)]),
                "s_nationkey": pa.array([i % 25 for i in range(ns)], pa.int32()),
                "s_acctbal": pa.array(
                    [-100.0 if i % 9 == 0 else round(i * 211.7 % 9000, 2)
                     for i in range(ns)],
                    pa.float64(),
                ),
            }
        ),
    )

    # --------------------------------------------------------------- part
    npart = 100
    t1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    t2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
    t3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(npart), pa.int64()),
                "p_name": pa.array([f"part_{i}" for i in range(npart)]),
                "p_brand": pa.array([f"Brand#{i % 25}" for i in range(npart)]),
                "p_type": pa.array(
                    [
                        f"{t1[i % 6]} {t2[i % 5]} {t3[i % 5]}"
                        for i in range(npart)
                    ]
                ),
                "p_size": pa.array([1 + i % 50 for i in range(npart)], pa.int32()),
                # identical retail price for a tie block
                "p_retailprice": pa.array(
                    [1000.0 if i % 4 == 0 else round(900 + i * 10.01, 2)
                     for i in range(npart)],
                    pa.float64(),
                ),
            }
        ),
    )

    # ------------------------------------------------------------- orders
    no = 500
    okeys, ocust, ostat, opr, odate, oprio = [], [], [], [], [], []
    for i in range(no):
        okeys.append(i)
        # skew: customer 0 owns 20% of orders; customers 150-199 own none
        ocust.append(0 if i % 5 == 0 else (i * 31) % 150)
        ostat.append(["O", "F", "P"][i % 3])
        opr.append(5000.0 if i % 6 == 0 else round(1000 + i * 97.3 % 40000, 2))
        # date ties: everything lands on one of 8 days
        odate.append(ts((i % 8) * 86400))
        oprio.append(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"][i % 5]
        )
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(okeys, pa.int64()),
                "o_custkey": pa.array(ocust, pa.int64()),
                "o_orderstatus": pa.array(ostat),
                "o_totalprice": pa.array(opr, pa.float64()),
                "o_orderdate": pa.array(odate, pa.timestamp(US)),
                "o_orderpriority": pa.array(oprio),
            }
        ),
    )

    # ----------------------------------------------------------- lineitem
    rows = []
    for o in range(no):
        nlines = 1 if o % 3 == 0 else (o % 7) + 1
        for ln in range(1, nlines + 1):
            i = o * 7 + ln
            qty = float(1 if i % 11 == 0 else i % 50 + 1)
            price = 100.0 if i % 5 == 0 else round(901 + i * 13.7 % 90000, 2)
            rows.append(
                (
                    o,
                    (i * 17) % npart,
                    (i * 13) % ns,
                    ln,
                    qty,
                    round(qty * price, 2),
                    0.0 if i % 4 == 0 else round((i % 11) / 100.0, 2),
                    round((i % 9) / 100.0, 2),
                    ["A", "N", "R"][i % 3],
                    ["O", "F"][i % 2],
                    ts((o % 8) * 86400 + (i % 3) * 30 * 86400),
                )
            )
    cols = list(zip(*rows))
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(cols[0], pa.int64()),
                "l_partkey": pa.array(cols[1], pa.int64()),
                "l_suppkey": pa.array(cols[2], pa.int64()),
                "l_linenumber": pa.array(cols[3], pa.int32()),
                "l_quantity": pa.array(cols[4], pa.float64()),
                "l_extendedprice": pa.array(cols[5], pa.float64()),
                "l_discount": pa.array(cols[6], pa.float64()),
                "l_tax": pa.array(cols[7], pa.float64()),
                "l_returnflag": pa.array(cols[8]),
                "l_linestatus": pa.array(cols[9]),
                "l_shipdate": pa.array(cols[10], pa.timestamp(US)),
            }
        ),
    )


if __name__ == "__main__":
    main()
