"""Print the next round's registry._PRIORITY candidate list: the 50
registered queries whose last driver-green round (per
CORRECTNESS_LEDGER.md) is oldest, never-checked first.

Round-N workflow: run this, paste the list into registry._PRIORITY,
update the ledger rows as driver results land, repeat.
"""
import re
import sys

sys.path.insert(0, "/root/repo")

ORDER = {"r4-pending": -1, "J3": 2.5}


def age_key(tag: str) -> float:
    if tag in ORDER:
        return ORDER[tag]
    m = re.match(r"r(\d+)$", tag)
    return float(m.group(1)) if m else -1


def main() -> None:
    from elastic_freight_spark import registry

    registry.load_all()
    rows = re.findall(
        r"^\| (\S+) \| (\S+) \| (\S+) \|",
        open("/root/repo/CORRECTNESS_LEDGER.md").read(),
        flags=re.M,
    )
    ledger = {q: tag for q, _, tag in rows if q != "query"}
    missing = [q for q in registry.QUERIES if q not in ledger]
    stale = [q for q in ledger if q not in registry.QUERIES]
    if missing:
        print(f"# WARNING: not in ledger (treated as never-checked): {missing}")
    if stale:
        print(f"# WARNING: ledger rows for unregistered queries: {stale}")
    ranked = sorted(
        registry.QUERIES,
        key=lambda q: (age_key(ledger.get(q, "never")), q),
    )
    print("_PRIORITY = (")
    for q in ranked[:50]:
        print(f'    "{q}",  # last green: {ledger.get(q, "never")}')
    print(")")


if __name__ == "__main__":
    main()
