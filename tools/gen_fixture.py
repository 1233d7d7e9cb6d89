#!/usr/bin/env python3
"""Generate the survey e2e fixture (FIXTURES.md §A) + golden outputs.

Driver-side tooling only (pandas/numpy are not engine deps). The golden
tables are computed here with pandas following the reference semantics
documented in SURVEY.md §2 (value_counts, T6 "selected", weight coercion,
CSAT/NPS formulas, crosstab percent bases + margins, multi-dim
tabulation), with ONE documented deviation: percent rounding uses
half-up floor(x*10+0.5)/10 — the engine's cross-engine-deterministic
Rounding.halfUp — instead of numpy's banker's rounding.

Deterministic: seed 7. Run once; artifacts are committed.
"""
import json
import re

import numpy as np
import pandas as pd

OUT = "src/test/resources/survey"
rng = np.random.default_rng(7)
N = 500

BRANDS = ["BrandA", "BrandB", "BrandC", "BrandD"]
REGIONS = ["North", "South", "East", "West"]
SECS = ["A", "B", "C"]
MULTI = ["1", "0", "", "Yes", "0.0"]  # "0.0" IS selected (app.py:401)


def pick(vals, p):
    return rng.choice(vals, size=N, p=p)


def gen_wave():
    df = pd.DataFrame({
        "resp_id": [f"R{i:04d}" for i in range(N)],
        "gender": pick([1, 2, 3], [0.48, 0.48, 0.04]),  # 3 = unmapped in codebook
        "age": rng.integers(18, 65, N),                  # no nulls → int in both engines
        "region": pick(REGIONS, [0.3, 0.3, 0.2, 0.2]),
        "sec": pick(SECS, [0.3, 0.5, 0.2]),
        "weight": pick(["1.0", "0.8", "1.2", "", "abc"], [0.4, 0.25, 0.25, 0.05, 0.05]),
        "tom_brand": pick(["BrandA", "brandb", " BrandC ", "", "BrandD"],
                          [0.35, 0.25, 0.2, 0.1, 0.1]),
    })
    for b in ["BrandA", "BrandB", "BrandC"]:
        df[f"UA_{b}"] = pick(MULTI, [0.4, 0.3, 0.1, 0.1, 0.1])
    for b in BRANDS:
        df[f"AA_{b}"] = pick(MULTI, [0.55, 0.25, 0.08, 0.07, 0.05])
    for b in ["BrandA", "BrandB"]:
        df[f"ever_used_{b}"] = pick(MULTI, [0.35, 0.4, 0.1, 0.1, 0.05])
    df["bumo"] = pick(["BrandA", "BrandB", "BrandC", ""], [0.4, 0.3, 0.2, 0.1])
    for b in ["BrandA", "BrandB"]:
        df[f"consider_{b}"] = pick(MULTI, [0.3, 0.4, 0.15, 0.1, 0.05])
    # osat: 1-5 scale + garbage + blanks → string column in both engines
    df["osat"] = pick(["1", "2", "3", "4", "5", "", "dk"],
                      [0.05, 0.1, 0.2, 0.35, 0.2, 0.05, 0.05])
    # nps: 0-10 + out-of-range 11 + blanks + garbage → string column
    df["nps_recommend"] = pick(
        [str(i) for i in range(11)] + ["11", "", "na"],
        [0.02, 0.02, 0.03, 0.04, 0.05, 0.08, 0.1, 0.14, 0.16, 0.14, 0.12,
         0.03, 0.04, 0.03])
    return df


CODEBOOK = pd.DataFrame(
    [["gender", "1", "Male"], ["gender", "2", "Female"],
     ["sec", "A", "Upper"], ["sec", "B", "Middle"],
     ["city", "1", "Jakarta"]],  # column absent from wave1 → ignored
    columns=["column", "value", "label"])

MAPPING = {
    "respondent_id": "resp_id",
    "demographics": ["gender", "age", "region", "sec"],
    "awareness": {"tom": "tom_brand",
                  "unaided": ["UA_BrandA", "UA_BrandB", "UA_BrandC"],
                  "aided": ["AA_BrandA", "AA_BrandB", "AA_BrandC", "AA_BrandD"]},
    "usage": {"ever_used": ["ever_used_BrandA", "ever_used_BrandB"],
              "bumo": ["bumo"],
              "consider": ["consider_BrandA", "consider_BrandB"]},
    "satisfaction": {"csat": "osat"},
    "nps": {"score": "nps_recommend"},
}


def half_up(x, d=1):
    p = 10 ** d
    return np.floor(x * p + 0.5) / p


def apply_codebook(df):
    maps = {c: dict(zip(s["value"].astype(str), s["label"].astype(str)))
            for c, s in CODEBOOK.groupby("column")}
    for c, m in maps.items():
        if c in df.columns:
            df[c] = df[c].astype(str).map(m).fillna(df[c].astype(str))
    return df


def selected(s):
    return s.notna() & s.astype(str).str.strip().ne("") & s.astype(str).str.lower().ne("0")


def weights(df):
    return pd.to_numeric(df["weight"], errors="coerce").fillna(0.0)


PREFIXES = [r"^ua[_-]?", r"^aa[_-]?", r"^aw[_-]?", r"^ever[_-]?", r"^everused[_-]?",
            r"^consider[_-]?", r"^consid[_-]?", r"^cs[_-]?", r"^used[_-]?", r"^brand[_-]?"]
SUFFIXES = [r"[_-]?brand$", r"[_-]?used$", r"[_-]?ever$", r"[_-]?consider$",
            r"[_-]?aided$", r"[_-]?unaided$"]


def extract_brand(col):
    s = col
    for p in PREFIXES:
        s = re.sub(p, "", s, flags=re.IGNORECASE)
    for p in SUFFIXES:
        s = re.sub(p, "", s, flags=re.IGNORECASE)
    s = re.sub(r"[_-]+", " ", s).strip()
    return s if s else col


def golden(df):
    out = {}
    # awareness_tom: value_counts
    s = df["tom_brand"].dropna().astype(str).str.strip()
    s = s[s.ne("")]
    vc = s.value_counts()
    out["awareness_tom"] = [{"brand": k, "count": int(v)} for k, v in vc.items()]

    def sel_table(cols):
        return [{"brand": c, "count": int(selected(df[c]).sum())} for c in cols]

    out["awareness_unaided"] = sel_table(MAPPING["awareness"]["unaided"])
    out["awareness_aided"] = sel_table(MAPPING["awareness"]["aided"])
    out["usage_ever_used"] = sel_table(MAPPING["usage"]["ever_used"])
    out["usage_bumo"] = sel_table(MAPPING["usage"]["bumo"])
    out["usage_consider"] = sel_table(MAPPING["usage"]["consider"])

    cs = pd.to_numeric(df["osat"], errors="coerce")
    out["satisfaction_summary"] = [
        {"metric": "mean", "value": float(cs.mean())},
        {"metric": "top2_box", "value": float((cs >= cs.max() - 1).mean())},
        {"metric": "n", "value": float(cs.notna().sum())}]

    ns = pd.to_numeric(df["nps_recommend"], errors="coerce")
    detr = int(((ns >= 0) & (ns <= 6)).sum())
    pas = int(((ns >= 7) & (ns <= 8)).sum())
    prom = int(((ns >= 9) & (ns <= 10)).sum())
    n = int(ns.notna().sum())
    out["nps_summary"] = [
        {"metric": "nps", "value": (prom / n - detr / n) * 100},
        {"metric": "n", "value": float(n)},
        {"metric": "promoters", "value": float(prom)},
        {"metric": "passives", "value": float(pas)},
        {"metric": "detractors", "value": float(detr)}]

    bd = []
    tb = sorted(s.unique().tolist())
    bd += [{"group": "TOM", "brand": b} for b in tb]
    for g, cols in [("Unaided", MAPPING["awareness"]["unaided"]),
                    ("Aided", MAPPING["awareness"]["aided"]),
                    ("Ever Used", MAPPING["usage"]["ever_used"]),
                    ("BUMO", MAPPING["usage"]["bumo"]),
                    ("Consideration", MAPPING["usage"]["consider"])]:
        bd += [{"group": g, "brand": b} for b in sorted({extract_brand(c) for c in cols})]
    out["brand_dictionary"] = bd

    # full tabulation: every column, astype(str).strip, dropna=False
    tab = []
    for col in df.columns:
        ser = df[col].astype(str).str.strip()
        for val, cnt in ser.value_counts(dropna=False).items():
            tab.append({"column": col, "value": val, "count": int(cnt)})
    out["tabulation"] = tab

    # crosstab region × gender, weighted, all percent bases, with margins
    w = weights(df)
    tmp = df[["region", "gender"]].copy()
    tmp["__w__"] = w
    piv = pd.pivot_table(tmp, index="region", columns="gender", values="__w__",
                         aggfunc="sum", fill_value=0)
    for mode in ["total", "row", "col"]:
        if mode == "row":
            denom = piv.sum(axis=1).replace(0, np.nan)
            pct = piv.div(denom, axis=0) * 100
        elif mode == "col":
            denom = piv.sum(axis=0).replace(0, np.nan)
            pct = piv.div(denom, axis=1) * 100
        else:
            d = piv.values.sum()
            pct = piv / (d if d != 0 else np.nan) * 100
        pct = half_up(pct, 1)
        p2, x2 = piv.copy(), pct.copy()
        p2.loc["Total", :] = p2.sum(axis=0)
        p2.loc[:, "Total"] = p2.sum(axis=1)
        x2.loc["Total", :] = x2.sum(axis=0) if mode != "row" else 100.0
        x2.loc[:, "Total"] = x2.sum(axis=1) if mode != "col" else 100.0
        rows = []
        for label, frame, t in [(None, p2, "count"), (None, x2, f"%_{mode}")]:
            fr = frame.reset_index()
            fr["__type__"] = t
            for _, r in fr.iterrows():
                rec = {"region": str(r["region"]), "__type__": r["__type__"]}
                for c in frame.columns:
                    v = r[c]
                    rec[str(c)] = None if pd.isna(v) else float(v)
                rows.append(rec)
        out[f"crosstab_{mode}"] = rows

    # multi-dim region × gender × sec, percent by total and by region
    grp = tmp2 = df[["region", "gender", "sec"]].copy()
    tmp2["__w__"] = w
    g = tmp2.groupby(["region", "gender", "sec"], dropna=False)["__w__"].sum() \
        .rename("count").reset_index()
    total = g["count"].sum()
    for mode in ["total", "region"]:
        gg = g.copy()
        if mode == "total":
            gg["pct"] = half_up(gg["count"] / (total if total else np.nan) * 100, 1)
        else:
            denom = gg.groupby("region")["count"].transform("sum").replace(0, np.nan)
            gg["pct"] = half_up(gg["count"] / denom * 100, 1)
        out[f"multi_tab_{mode}"] = [
            {"region": str(r["region"]), "gender": str(r["gender"]), "sec": str(r["sec"]),
             "count": float(r["count"]),
             "pct": None if pd.isna(r["pct"]) else float(r["pct"])}
            for _, r in gg.iterrows()]
    return out


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    wave = gen_wave()
    wave.to_csv(f"{OUT}/wave1.csv", index=False)
    CODEBOOK.to_csv(f"{OUT}/codebook.csv", index=False)
    with open(f"{OUT}/mapping_config.json", "w") as f:
        json.dump(MAPPING, f, indent=2)
    # goldens computed on the RECODED frame (codebook applied in place,
    # app.py:225-227), like the reference
    recoded = apply_codebook(pd.read_csv(f"{OUT}/wave1.csv"))
    with open(f"{OUT}/golden.json", "w") as f:
        json.dump(golden(recoded), f, indent=1)
    print("rows:", len(wave), "golden tables:", "ok")


if __name__ == "__main__":
    main()
