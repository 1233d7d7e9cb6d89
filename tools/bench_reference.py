#!/usr/bin/env python3
"""Measure the REFERENCE's computational core (pandas, single process) on
the driver-generated testdata, for the engine-vs-reference throughput
comparison the charter asks for (the reference repo publishes no numbers).

Re-implements the reference's pandas call shapes (groupby / pivot_table /
value_counts / astype(str) stringification — see SURVEY.md §2 citations)
against the same parquet the Spark engine reads. This is measurement
tooling only; it is NOT part of the engine.

Usage: python3 tools/bench_reference.py /root/testdata/sf0.1
Output: one JSON line {"queries": {...}, "total": sec}
"""
import json
import sys
import time

import pandas as pd


def main(sf_dir: str) -> None:
    t = {}

    def timed(name):
        def deco(fn):
            t0 = time.perf_counter()
            fn()
            t[name] = time.perf_counter() - t0
        return deco

    lineitem = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    part = pd.read_parquet(f"{sf_dir}/part.parquet")

    # A1 value_counts (app.py:84-92)
    @timed("a1_value_counts")
    def _a1():
        s = customer["c_mktsegment"].dropna().astype(str).str.strip()
        s[s != ""].value_counts()

    # A2 weighted freq table (app.py:108-115)
    @timed("a2_freq_table")
    def _a2():
        w = pd.to_numeric(lineitem["l_quantity"], errors="coerce").fillna(0.0)
        df = pd.DataFrame({"value": lineitem["l_returnflag"].astype(str).str.strip(), "w": w})
        counts = df.groupby("value")["w"].sum().reset_index(name="count")
        counts["pct_total"] = (counts["count"] / counts["count"].sum() * 100).round(1)
        counts.sort_values("count", ascending=False)

    # A3 weighted crosstab + margins + pct (app.py:118-156)
    @timed("a3_crosstab")
    def _a3():
        w = pd.to_numeric(lineitem["l_quantity"], errors="coerce").fillna(0.0)
        df = pd.DataFrame({
            "r": lineitem["l_returnflag"].astype(str),
            "c": lineitem["l_linestatus"].astype(str),
            "w": w})
        piv = df.pivot_table(index="r", columns="c", values="w",
                             aggfunc="sum", fill_value=0)
        total = piv.values.sum()
        pct = (piv / total * 100).round(1)
        piv.loc["Total"] = piv.sum()
        piv["Total"] = piv.sum(axis=1)
        pct.loc["Total"] = pct.sum()
        pct["Total"] = pct.sum(axis=1)

    # A5 full tabulation, 3 columns incl. timestamp stringify (app.py:519-531)
    @timed("a5_full_tabulation")
    def _a5():
        for col in ["o_orderstatus", "o_orderdate", "o_totalprice"]:
            vals = orders[col].astype(str).str.strip()
            vals.value_counts(dropna=False)

    # A6 selected counts (app.py:396-415)
    @timed("a6_selected_counts")
    def _a6():
        for col in ["o_orderstatus", "o_orderpriority"]:
            s = orders[col]
            sel = s.notna() & (s.astype(str).str.strip() != "") & (s.astype(str).str.lower() != "0")
            int(sel.sum())

    # A7 CSAT (app.py:437-444)
    @timed("a7_csat")
    def _a7():
        s = pd.to_numeric(lineitem["l_quantity"], errors="coerce")
        mx = s.max()
        (s.mean(), (s >= mx - 1).mean(), int(s.notna().sum()))

    # A8 NPS (app.py:447-459)
    @timed("a8_nps")
    def _a8():
        s = pd.to_numeric(part["p_size"], errors="coerce")
        n = int(s.notna().sum())
        prom = int(((s >= 9) & (s <= 10)).sum())
        detr = int(((s >= 0) & (s <= 6)).sum())
        (prom / n - detr / n) * 100

    print(json.dumps({"queries": {k: round(v, 4) for k, v in t.items()},
                      "total": round(sum(t.values()), 4),
                      "sf": sf_dir, "engine": "pandas-reference"}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
