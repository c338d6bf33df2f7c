"""Fold a driver CORRECTNESS_r{N}.json into CORRECTNESS_LEDGER.md:
every hash-green (or rows-green for rows-only) query's row gets tag
rN; queries registered but missing from the ledger are appended as
`never` (hash) rows so rotate_priority sees them. Round-5's judge
finding was exactly this drift (3 missing rows, 23 stale `never`s) —
run this once per round, right after the driver writes the file:

    python tools/update_ledger.py CORRECTNESS_r06.json r6
"""
import json
import re
import sys

sys.path.insert(0, "/root/repo")

LEDGER = "/root/repo/CORRECTNESS_LEDGER.md"


def main() -> None:
    path, tag = sys.argv[1], sys.argv[2]
    assert re.fullmatch(r"r\d+", tag), "tag like r6"
    res = json.load(open(path))
    green = {
        q
        for q, v in res.items()
        if v.get("hash_match")
        or (v.get("err") == "no_oracle" and v.get("spark_rows", 0) > 0)
    }
    txt = open(LEDGER).read()
    updated = []

    def repl(m):
        q, oracle = m.group(1), m.group(2)
        if q in green and q != "query":
            updated.append(q)
            return f"| {q} | {oracle} | {tag} |"
        return m.group(0)

    txt = re.sub(r"^\| (\S+) \| (\S+) \| (\S+) \|$", repl, txt, flags=re.M)

    from elastic_freight_spark import registry

    registry.load_all()
    ledgered = set(
        re.findall(r"^\| (\S+) \| \S+ \| \S+ \|$", txt, flags=re.M)
    )
    missing = [q for q in registry.QUERIES if q not in ledgered]
    if missing:
        # insert before the Totals paragraph
        rows = "".join(
            f"| {q} | {'hash' if q in registry.ORACLE else 'rows-only'} | never |\n"
            for q in missing
        )
        i = txt.index("\nTotals:")
        txt = txt[: i + 1] + rows + txt[i + 1 :]
    open(LEDGER, "w").write(txt)
    print(
        f"updated {len(updated)} rows to {tag}; appended {len(missing)} "
        f"missing as never; greens not in ledger: "
        f"{sorted(green - set(updated) - set(missing))}"
    )
    print("NOTE: refresh the Totals paragraph tallies by hand "
          "(grep -oE '\\| (hash|rows-only) \\| \\S+ \\|$' | sort | uniq -c).")


if __name__ == "__main__":
    main()
