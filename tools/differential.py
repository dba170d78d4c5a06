#!/usr/bin/env python3
"""Differential test vs the ACTUAL reference implementation (SURVEY §5.2#4).

gen:     generate N random nested docs (seeded), run the reference
         engine on them (executed as a behavioral oracle from
         /root/reference, with its absent imports stubbed), write
         docs.jsonl + expected.json into the work dir.
compare: read the Spark-side flattened TSV (produced by
         `sbt "runMain graft.tools.FlattenDump <docs.jsonl> <out.tsv>"`)
         and compare cell-by-cell against the reference output.

Comparison is exact-string except JSON-shaped cells containing objects,
which are compared as parsed values (documented divergence: our engine
renders struct cells via Spark to_json — compact separators, schema-sorted
keys — where Python json.dumps uses ", " and insertion order).

Generated docs avoid only the quirk classes where we deliberately FIXED
reference bugs (digit map keys, underscore keys, case collisions) and
explicit nulls (documented presence divergence); everything else —
ragged/empty arrays, missing keys across docs, deep nesting, dynamic map
keys, empty strings, unicode-free strings, int/float/bool leaves — is fair
game.
"""
import csv
import json
import random
import sys
import types


def make_gen(seed):
    rnd = random.Random(seed)
    # One TYPE per key, as Elasticsearch index mappings enforce for the
    # reference's own data source: a field cannot be a boolean in one
    # document and an object in another within one index. Structure
    # (missing keys, ragged/empty arrays, value contents) still varies.
    typed_keys = [
        ("countA", "int"), ("countB", "int"),
        ("priceA", "float"), ("priceB", "float"),
        ("flagA", "bool"), ("flagB", "bool"),
        ("nameA", "str"), ("nameB", "str"), ("nameC", "str"),
        ("innerA", "obj"), ("innerB", "obj"),
        ("itemsA", "arrobj"), ("itemsB", "arrobj"),
        ("codesA", "arrstr"), ("valsA", "arrnum"),
    ]
    strpool = ["", "x", "hello world", "AB-12", "code/47", "space end ",
               "quote\"inside", "back\\slash"]

    def leaf(t):
        if t == "int":
            return rnd.randint(-10**6, 10**6)
        if t == "float":
            return rnd.randint(-999, 999) + rnd.choice([0.0, 0.5, 0.25])
        if t == "bool":
            return rnd.choice([True, False])
        return rnd.choice(strpool)

    def obj(depth):
        n = rnd.randint(2, 7)
        ks = rnd.sample(typed_keys, n)
        out = {}
        for k, t in ks:
            if t == "obj":
                if depth > 0:
                    out[k] = obj(depth - 1)
            elif t == "arrobj":
                if depth > 0:
                    out[k] = [obj(depth - 1)
                              for _ in range(rnd.randint(0, 3))]
            elif t == "arrstr":
                out[k] = [rnd.choice(strpool)
                          for _ in range(rnd.randint(0, 4))]
            elif t == "arrnum":
                # one numeric type per key (mapping-stable), floats here
                out[k] = [leaf("float") for _ in range(rnd.randint(0, 4))]
            else:
                out[k] = leaf(t)
        return out

    return obj


def gen(workdir, n=40, seed=7):
    import os
    os.makedirs(workdir, exist_ok=True)
    g = make_gen(seed)
    docs = []
    for i in range(n):
        d = g(3)
        d["docId"] = i  # row alignment key
        docs.append(d)
    with open(f"{workdir}/docs.jsonl", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    # run the reference implementation as an oracle
    sys.modules["elasticsearch_config"] = types.SimpleNamespace(
        BASE_QUERY={}, ES=None)
    sys.modules["utils"] = types.SimpleNamespace(
        log_to_sql_db=lambda **kw: None)
    src = open("/root/reference/ElasticSearch ETL.py").read()
    gl = {"__name__": "ref"}
    exec(compile(src, "ref.py", "exec"), gl)
    df = gl["json_to_tsv_in_memory"](
        {"hits": {"hits": [{"_source": d} for d in docs]}})
    expected = {"columns": list(df.columns),
                "rows": df.to_dict(orient="records")}
    json.dump(expected, open(f"{workdir}/expected.json", "w"))
    print(f"generated {n} docs, reference produced "
          f"{len(df.columns)} columns")


def json_equalish(a, b):
    try:
        return json.loads(a) == json.loads(b)
    except Exception:
        return False


def compare(workdir, tsv_path):
    exp = json.load(open(f"{workdir}/expected.json"))
    with open(tsv_path, newline="") as f:
        rdr = csv.DictReader(f, dialect="excel-tab")
        actual_rows = list(rdr)
    exp_by_id = {r["DocId"]: r for r in exp["rows"]}
    act_by_id = {r["DocId"]: r for r in actual_rows}
    exp_cols = set(exp["columns"])
    act_cols = set(actual_rows[0].keys())
    bad = 0
    if exp_cols != act_cols:
        print(f"COLUMN MISMATCH: only-ref={sorted(exp_cols - act_cols)[:10]} "
              f"only-us={sorted(act_cols - exp_cols)[:10]}")
        bad += 1
    for did, er in exp_by_id.items():
        ar = act_by_id.get(did)
        if ar is None:
            print(f"missing doc {did}")
            bad += 1
            continue
        for c in exp_cols & act_cols:
            e, a = er[c], ar[c]
            if e == a:
                continue
            if (e.startswith("[") or e.startswith("{")) and json_equalish(e, a):
                continue
            print(f"CELL DIFF doc={did} col={c}: ref={e!r} us={a!r}")
            bad += 1
            if bad > 20:
                print("...")
                sys.exit(1)
    print("MATCH" if bad == 0 else f"{bad} diffs")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(sys.argv[2], *map(int, sys.argv[3:]))
    else:
        compare(sys.argv[2], sys.argv[3])
