"""Independent golden oracle for the 990 extraction engine.

This module deliberately RE-IMPLEMENTS the extraction semantics with
``xml.etree.ElementTree``, per-document and row-at-a-time — the
reference's own execution model (scrapeXML + build_rdb_table,
build_efile_database_functions.R:307-2860, :210-276) — so the Spark
pipeline (from_xml superset struct + Catalyst column expressions) can be
verified against a second, structurally different implementation over
the same XMLs. It shares only the *metadata* (core_spec/rdb_tables JSON
and the driver-side group-inference algorithms) with the Spark path;
parsing and evaluation are fully independent.

Also emits DuckDB-runnable ``SELECT ... UNION ALL`` literal SQL so the
driver's oracle gate can compare the Spark output hash against these
golden rows.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from pathlib import Path

from ..plans.concordance import (
    concrete_groups,
    load_core_spec,
    load_rdb_spec,
    load_schedn_spec,
    schedule_guard,
    table_rows,
)

_OBJECT_ID_RE = re.compile(r"([0-9A-Za-z]+)_public\.xml")


def load_doc(xml_text: str) -> ET.Element:
    """Parse and strip namespaces (the reference's xml_ns_strip,
    build_efile_database_functions.R:5018)."""
    root = ET.fromstring(xml_text)
    for el in root.iter():
        if "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]
    return root


def _parts(xpath: str) -> list[str]:
    parts = [p for p in xpath.split("/") if p]
    if parts and parts[0] == "Return":
        parts = parts[1:]
    return parts


def _kids(n: ET.Element, seg: str) -> list[ET.Element]:
    """Child-element step, case-insensitive on a miss: the engine's
    from_xml matches element names case-insensitively
    (spark.sql.caseSensitive=false — Spark XML source semantics), so
    the golden must too. Exact matches win outright (a doc carrying
    BOTH casings of one tag under one parent is out of scope for both
    engines — no XSD vintage does that). Found by the full-master
    value fuzz via the AppliedToESTaxAmt/AppliedToEsTaxAmt vintage
    rename (IRS990PF Part VI)."""
    hits = n.findall(seg)
    if hits:
        return hits
    low = seg.lower()
    return [
        c for c in n if isinstance(c.tag, str) and c.tag.lower() == low
    ]


def _match_values(root: ET.Element, xpath: str) -> list[str | None]:
    """All matched text/attribute values at xpath, document order."""
    parts = _parts(xpath)
    nodes: list[ET.Element] = [root]
    for i, seg in enumerate(parts):
        if seg.startswith("@"):
            return [n.get(seg[1:]) for n in nodes if n.get(seg[1:]) is not None]
        nxt: list[ET.Element] = []
        for n in nodes:
            nxt.extend(_kids(n, seg))
        nodes = nxt
    # xml2 semantics (the reference's xml_text, which never returns NA
    # for a PRESENT node): an empty leaf — <X/> or <X></X> — is "",
    # not missing; ElementTree's .text is None for both, so map
    # childless-with-no-text to "". Nodes with children keep None here
    # (the engine's struct nodes have no direct scalar either; xml2's
    # descendant-text concatenation is out of scope for both engines).
    return [
        n.text if n.text is not None else ("" if len(n) == 0 else None)
        for n in nodes
    ]


def _match_nodes(root: ET.Element, xpath: str) -> list[ET.Element]:
    parts = _parts(xpath)
    nodes: list[ET.Element] = [root]
    for seg in parts:
        nxt: list[ET.Element] = []
        for n in nodes:
            nxt.extend(_kids(n, seg))
        nodes = nxt
    return nodes


def _find_rel(node: ET.Element, rel: str) -> ET.Element | None:
    """First match of a relative leaf path, case-insensitive per step
    (same from_xml-alignment as ``_kids``)."""
    nodes = [node]
    for seg in [p for p in rel.split("/") if p]:
        nxt: list[ET.Element] = []
        for n in nodes:
            nxt.extend(_kids(n, seg))
        nodes = nxt
        if not nodes:
            return None
    return nodes[0]


def _scalar(root: ET.Element, xpath: str) -> str | None:
    """First non-null match (compiler._to_scalar semantics)."""
    for v in _match_values(root, xpath):
        if v is not None:
            return v
    return None


def _coalesce(root: ET.Element, xpaths: list[str]) -> str | None:
    for xp in xpaths:
        v = _scalar(root, xp)
        if v is not None:
            return v
    return None


def _any_present(root: ET.Element, xpaths: list[str]) -> bool:
    for xp in xpaths:
        parts = _parts(xp)
        if parts and parts[-1].startswith("@"):
            if _match_values(root, xp):
                return True
        elif _match_nodes(root, xp):
            return True
    return False


def _collapsed(root: ET.Element, xpaths: list[str], sep: str = " ") -> str | None:
    vals: list[str] = []
    for xp in xpaths:
        vals.extend(v for v in _match_values(root, xp) if v is not None)
    joined = sep.join(vals)
    return joined if joined != "" else None


def _to_long(v: str | None) -> int | None:
    if v is None:
        return None
    try:
        return int(v)
    except ValueError:
        try:
            return int(float(v))
        except ValueError:
            return None


def _apply_rule(v, rule: str | None, formtype: str | None):
    if rule == "zeroALL":
        return v if v is not None else "0"
    if rule == "zeroPC" and formtype == "990":
        return v if v is not None else "0"
    if rule == "zeroEZ" and formtype == "990EZ":
        return v if v is not None else "0"
    return v


def golden_core_row(url: str, xml_text: str) -> dict:
    """One CORE row per document — the golden scrapeXML analog."""
    spec = load_core_spec()
    vars_ = spec["vars"]
    root = load_doc(xml_text)
    formtype = _coalesce(root, vars_["FORMTYPE"]["xpaths"])

    row: dict = {}
    # pass 1: scalars
    for var, s in vars_.items():
        if s.get("kind") != "scalar":
            continue
        if s.get("collapse") == " ":
            v = _collapsed(root, s["xpaths"], " ")
        elif "recode_present" in s:
            v = s["recode_present"] if _any_present(root, s["xpaths"]) else None
        else:
            v = _coalesce(root, s["xpaths"])
        row[var] = _apply_rule(v, s.get("rule"), formtype)

    # pass 2: derived
    for var, s in vars_.items():
        kind = s.get("kind")
        if kind == "concat_collapse":
            joined = "".join(row[c] or "" for c in s["components"])
            row[var] = joined if joined != "" else None
        elif kind == "conditional_sum":
            if formtype == "990":
                v = str(sum(_to_long(row[c]) or 0 for c in s["pc_components"]))
            else:
                v = _coalesce(root, s["ez_xpaths"])
            row[var] = _apply_rule(v, s.get("rule"), formtype)
        elif kind == "sum_with_fallback":
            comps = [row[c] for c in s["pc_components"]]
            if all(c is None for c in comps):
                v = _coalesce(root, s["ez_xpaths"])
            else:
                v = str(sum(_to_long(c) or 0 for c in comps))
            row[var] = _apply_rule(v, s.get("rule"), formtype)
        elif kind == "schedule_flag":
            row[var] = s["schedule"] in xml_text
        elif kind == "url":
            row[var] = url
        elif kind == "object_id_from_url":
            m = _OBJECT_ID_RE.search(url)
            row[var] = m.group(1) if m else ""
    return row


def _key_row(url: str, root: ET.Element) -> dict:
    core = load_core_spec()["vars"]
    m = _OBJECT_ID_RE.search(url)
    return {
        "OBJECT_ID": m.group(1) if m else "",
        "EIN": _coalesce(root, core["EIN"]["xpaths"]),
        "NAME": _coalesce(root, core["NAME"]["xpaths"]),
        "TAXYR": _coalesce(root, core["FISYR"]["xpaths"]),
        "FORMTYPE": _coalesce(root, core["FORMTYPE"]["xpaths"]),
        "URL": url,
    }


def golden_rdb_rows(
    url: str, xml_text: str, table_name: str
) -> tuple[list[str], list[dict]]:
    """(column order, rows) for one document of the named table — the
    golden build_rdb_table analog (reference :210-276)."""
    rows_meta = table_rows(table_name)
    if not rows_meta:
        raise KeyError(table_name)
    member = schedule_guard(rows_meta)
    if member is not None and member not in xml_text:
        return [], []
    root = load_doc(xml_text)
    keys = _key_row(url, root)
    key_cols = list(keys)

    ones = [r for r in rows_meta if r["cardinality"] == "ONE"]
    manys = [r for r in rows_meta if r["cardinality"] == "MANY"]

    if ones and not manys:
        by_var: dict[str, list[str]] = {}
        for r in ones:
            by_var.setdefault(r["variable"], []).append(r["xpath"])
        row = dict(keys)
        for var, xps in by_var.items():
            row[var] = _coalesce(root, xps)
        return key_cols + list(by_var), [row]

    out_rows: list[dict] = []
    col_order: list[str] = list(key_cols)
    for gp, leaves in concrete_groups(manys).items():
        real_group = any(rel for rel in leaves)
        if not real_group:
            var = next(iter(leaves.values()))
            if var not in col_order:
                col_order.append(var)
            if _match_nodes(root, gp):
                out_rows.append({**keys, var: _scalar(root, gp)})
            continue
        by_var: dict[str, list[str]] = {}
        for rel, var in leaves.items():
            by_var.setdefault(var, []).append(rel)
        for var in by_var:
            if var not in col_order:
                col_order.append(var)
        for node in _match_nodes(root, gp):
            row = dict(keys)
            for var, rels in by_var.items():
                v = None
                for rel in rels:
                    hit = _find_rel(node, rel)
                    if hit is not None and hit.text is not None:
                        v = hit.text
                        break
                row[var] = v
            out_rows.append(row)
    return col_order, out_rows


def golden_schedn_rows(
    url: str, xml_text: str, table_name: str
) -> tuple[list[str], list[dict]]:
    """(column order, rows) for one document of the named SCHED-N table
    — golden analog of the reference's hand-rolled Schedule N section
    (:2875-4140), guarded on schedule presence (:2881)."""
    spec = load_schedn_spec()
    t = spec["tables"][table_name]
    cols = list(spec["header"]) + list(t["columns"])
    if "IRS990ScheduleN" not in xml_text:
        return cols, []
    core = golden_core_row(url, xml_text)
    header = {h: core[h] for h in spec["header"]}
    root = load_doc(xml_text)

    if t["cardinality"] == "ONE":
        row = dict(header)
        for v in t["columns"]:
            row[v] = _coalesce(root, t["vars"][v]["xpaths"])
        return cols, [row]

    out: list[dict] = []
    for gp in t["groups"]:
        for node in _match_nodes(root, gp):
            row = dict(header)
            for v in t["columns"]:
                val = None
                for rel in t["vars"][v]["rels"]:
                    hit = _find_rel(node, rel)
                    if hit is not None and hit.text is not None:
                        val = hit.text
                        break
                row[v] = val
            out.append(row)
    return cols, out


# --------------------------------------------------------------- SQL

def _sql_lit(v, sql_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {sql_type})"
    if sql_type == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if sql_type in ("BIGINT", "INTEGER", "DOUBLE"):
        return f"CAST({v} AS {sql_type})"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def typed_values_sql(
    cols: list[str], rows: list[dict], types: dict[str, str]
) -> str:
    """Literal golden rows as a DuckDB SELECT ... UNION ALL chain;
    per-column SQL types via ``types`` (default VARCHAR)."""
    t = {c: types.get(c, "VARCHAR") for c in cols}
    if not rows:
        sel = ", ".join(f"CAST(NULL AS {t[c]}) AS {c}" for c in cols)
        return f"SELECT {sel} WHERE FALSE"
    selects = []
    for r in rows:
        sel = ", ".join(f"{_sql_lit(r.get(c), t[c])} AS {c}" for c in cols)
        selects.append(f"SELECT {sel}")
    return "\nUNION ALL\n".join(selects)


def values_sql(cols: list[str], rows: list[dict], bool_cols: set[str]) -> str:
    return typed_values_sql(cols, rows, {c: "BOOLEAN" for c in bool_cols})


def fixtures_dir() -> Path:
    return Path(__file__).resolve().parent.parent.parent / "tests" / "fixtures"


def fixture_files() -> list[Path]:
    return sorted(fixtures_dir().glob("*.xml"))


def _file_url(p: Path) -> str:
    return p.resolve().as_uri()


def _doc_pairs(docs: list[tuple[str, str]] | None) -> list[tuple[str, str]]:
    """(url, xml_text) pairs — the committed fixture matrix by default,
    or any caller-supplied corpus (e.g. the deterministic realistic-size
    docs from corpusgen, VERDICT r12 next-round #1)."""
    if docs is not None:
        return docs
    return [(_file_url(p), p.read_text()) for p in fixture_files()]


def golden_core_sql(docs: list[tuple[str, str]] | None = None) -> str:
    spec = load_core_spec()
    cols = list(dict.fromkeys(spec["columns"]))  # dedup faithful ORGDISSOLVED dup
    bool_cols = {
        v for v, s in spec["vars"].items() if s.get("kind") == "schedule_flag"
    }
    rows = [golden_core_row(u, x) for u, x in _doc_pairs(docs)]
    return values_sql(cols, rows, bool_cols)


def golden_schedn_sql(
    table_name: str, docs: list[tuple[str, str]] | None = None
) -> str:
    cols: list[str] = []
    rows: list[dict] = []
    for u, x in _doc_pairs(docs):
        c, r = golden_schedn_rows(u, x, table_name)
        for col in c:
            if col not in cols:
                cols.append(col)
        rows.extend(r)
    return values_sql(cols, rows, {"SCHEDN"})


def golden_rdb_sql(
    table_name: str, docs: list[tuple[str, str]] | None = None
) -> str:
    cols: list[str] = []
    rows: list[dict] = []
    for u, x in _doc_pairs(docs):
        c, r = golden_rdb_rows(u, x, table_name)
        for col in c:
            if col not in cols:
                cols.append(col)
        rows.extend(r)
    if not cols:
        # no fixture carries this table's schedule: derive columns from metadata
        meta = table_rows(table_name)
        cols = ["OBJECT_ID", "EIN", "NAME", "TAXYR", "FORMTYPE", "URL"] + list(
            dict.fromkeys(r["variable"] for r in meta)
        )
    return values_sql(cols, rows, set())
