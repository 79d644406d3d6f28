"""Derive the 990 extraction metadata (variable → xpaths + production
rules) from the reference implementation's source and concordance CSVs,
and write it as JSON specs under ``irs_990_efiler_database_spark/metadata/``.

This extracts WHAT the reference computes (its embedded metadata: xpath
unions, null-default rules, checkbox recode labels, collapse groups,
conditional sums, schedule flags, output column order) — the engine then
compiles that metadata into Catalyst Column expressions. No reference
code is translated; the R source is treated as a metadata container,
exactly like its concordance CSVs.

Reference patterns recognized (file: BUILD_SCRIPTS/build_efile_database_functions.R):
- xpath symbol:        ``V_X <- "//Return/..."``             (e.g. :327-336)
- xpath union:         ``x <- paste(V1, V2, sep="|")``
- extraction:          ``VAR <- xml_text(xml_find_all(doc, x))``
- null normalization:  ``VAR[length(VAR) == 0] <- NA``
- presence recode:     ``if(is.na(VAR) == FALSE){ VAR <- "Label" }``  (:553-561)
- zero rules:          ``VAR <- zeroALL/zeroPC/zeroEZ(VAR)``          (:443-472)
- space collapse:      ``VAR <- paste(VAR, collapse=" ")``            (:527-528)
- concat collapse:     ``OUT <- gsub("NA", "", paste(A, B, ..., sep=""))`` (:620-621)
- conditional sum:     ``if(FORMTYPE == "990EZ"){...} else if(FORMTYPE == "990"){ OUT <- sum(as.numeric(A), ..., na.rm=T) }`` (:1034-1043)
- fallback sum:        PROFEESINDEP pattern (:1294-1304)
- schedule flag:       ``SCHEDA <- grepl("IRS990ScheduleA", doc)``    (:2522-2620)
- output order:        ``core <- namedList(EIN, NAME, ...)``          (:2768-2850)

Usage: python tools/derive_990_metadata.py
"""

from __future__ import annotations

import csv
import json
import re
from pathlib import Path

REF = Path("/root/reference/BUILD_SCRIPTS/build_efile_database_functions.R")
OUT_DIR = Path(__file__).resolve().parent.parent / "irs_990_efiler_database_spark" / "metadata"

SCRAPE_START, SCRAPE_END = 307, 2860  # scrapeXML scalar section


def _read_lines() -> list[str]:
    return REF.read_text(errors="replace").splitlines()


def _join_statements(lines: list[str]) -> list[str]:
    """Join continuation lines (unbalanced parens or trailing comma/operator)."""
    out: list[str] = []
    buf = ""
    for raw in lines:
        line = raw.strip()
        if line.startswith("#"):
            continue
        buf = f"{buf} {line}".strip() if buf else line
        if buf.count("(") > buf.count(")") or buf.rstrip().endswith((",", "&", "+", "<-")):
            continue
        if buf:
            out.append(buf)
        buf = ""
    if buf:
        out.append(buf)
    return out


RX_XPATH_SYM = re.compile(r'^([A-Za-z0-9._]+)\s*<-\s*"(//?Return/[^"]+)"\s*$')
RX_PASTE_UNION = re.compile(
    r"^([A-Za-z0-9._]+)\s*<-\s*paste\(\s*(.+?)\s*,\s*sep\s*=\s*\"\|\"\s*\)\s*$"
)
RX_EXTRACT = re.compile(
    r"^([A-Z][A-Z0-9_]*)\s*<-\s*(?:as\.numeric\(\s*)?xml_text\(\s*xml_find_all\(\s*doc\s*,\s*([A-Za-z0-9._\"/@\[\]:]+)\s*\)\s*\)\)?\s*$"
)
RX_LEN0_NA = re.compile(r"^([A-Z][A-Z0-9_]*)\[\s*length\(\s*\1\s*\)\s*==\s*0\s*\]\s*<-\s*NA\s*$")
RX_RECODE = re.compile(
    r"^if\(\s*is\.na\(\s*([A-Z][A-Z0-9_]*)\s*\)\s*==\s*FALSE\s*\)\s*\{\s*\1\s*<-\s*\"([^\"]*)\"\s*\}\s*$"
)
RX_ZERO = re.compile(r"^([A-Z][A-Z0-9_]*)\s*<-\s*(zeroALL|zeroPC|zeroEZ)\(\s*\1\s*\)\s*$")
RX_SPACE_COLLAPSE = re.compile(
    r'^([A-Z][A-Z0-9_]*)\s*<-\s*paste\(\s*\1\s*,\s*collapse\s*=\s*" "\s*\)\s*$'
)
RX_CONCAT_COLLAPSE = re.compile(
    r'^([A-Z][A-Z0-9_]*)\s*<-\s*gsub\(\s*"NA"\s*,\s*""\s*,\s*paste\(\s*(.+?)\s*,\s*sep\s*=\s*""\s*\)\s*\)\s*$'
)
RX_EMPTY_NA = re.compile(r'^([A-Z][A-Z0-9_]*)\[\s*\1\s*==\s*""\s*\]\s*<-\s*NA\s*$')
RX_SCHED_FLAG = re.compile(r'^(SCHED[A-Z])\s*<-\s*grepl\(\s*"([A-Za-z0-9]+)"\s*,\s*doc\s*\)\s*$')
RX_AS_CHy = re.compile(r"^([A-Z][A-Z0-9_]*)\s*<-\s*as\.character\(\s*\1\s*\)\s*$")
RX_SUM = re.compile(
    r"^([A-Z][A-Z0-9_]*)\s*<-\s*sum\(\s*(.+?)\s*,\s*na\.rm\s*=\s*T\s*\)\s*$"
)
RX_IF_FORM = re.compile(r'if\(\s*FORMTYPE\s*==\s*"(990EZ|990)"\s*\)\s*\{')


def parse_scrape(lines: list[str]) -> tuple[dict, list[str]]:
    body = lines[SCRAPE_START - 1 : SCRAPE_END]
    stmts = _join_statements(body)

    sym: dict[str, list[str]] = {}
    vars_: dict[str, dict] = {}
    unhandled: list[str] = []

    def resolve(token: str) -> list[str]:
        token = token.strip()
        if token.startswith('"') and token.endswith('"'):
            return token[1:-1].split("|")
        if token in sym:
            return sym[token]
        raise KeyError(token)

    # Pass 1: conditional-sum blocks span multiple statements; detect the
    # five known shapes by scanning the raw text with brace matching.
    text = "\n".join(body)
    def _match_brace(s: str, open_idx: int) -> int:
        depth = 0
        for j in range(open_idx, len(s)):
            if s[j] == "{":
                depth += 1
            elif s[j] == "}":
                depth -= 1
                if depth == 0:
                    return j
        return -1

    cond_sums: dict[str, dict] = {}
    for m in re.finditer(r'if\(\s*FORMTYPE\s*==\s*"990EZ"\s*\)\s*\{', text):
        ez_open = text.index("{", m.start())
        ez_close = _match_brace(text, ez_open)
        if ez_close < 0:
            continue
        tail = text[ez_close + 1 :]
        em = re.match(r'\s*else\s+if\(\s*FORMTYPE\s*==\s*"990"\s*\)\s*\{', tail)
        if not em:
            continue
        pc_open = ez_close + 1 + tail.index("{")
        pc_close = _match_brace(text, pc_open)
        ez_block = text[ez_open + 1 : ez_close]
        pc_block = text[pc_open + 1 : pc_close]
        sum_m = re.search(r"([A-Z][A-Z0-9_]*)\s*<-\s*sum\(\s*(.+?),\s*na\.rm", pc_block, re.S)
        if not sum_m:
            continue
        var = sum_m.group(1)
        comps = re.findall(r"as\.numeric\(\s*([A-Z][A-Z0-9_]*)\s*\)", sum_m.group(2))
        ez_paths = [pm.group(1) for pm in re.finditer(r'<-\s*"(//Return/[^"]+)"', ez_block)]
        cond_sums[var] = {"kind": "conditional_sum", "pc_components": comps, "ez_xpaths": ez_paths}

    # PROFEESINDEP fallback-sum shape (:1294-1304)
    m = re.search(
        r"PROFEESINDEP\s*<-\s*sum\(\s*(.+?),\s*na\.rm.*?xml_find_all\(\s*doc\s*,\s*([A-Za-z0-9._]+)\s*\)",
        text,
        re.S,
    )
    profees_comps = (
        re.findall(r"as\.numeric\(\s*([A-Z][A-Z0-9_]*)\s*\)", m.group(1)) if m else []
    )
    profees_sym = m.group(2) if m else None

    for st in stmts:
        if (m := RX_XPATH_SYM.match(st)) :
            sym[m.group(1)] = m.group(2).split("|")
            continue
        if (m := RX_PASTE_UNION.match(st)) :
            parts = [p.strip() for p in m.group(2).split(",")]
            try:
                sym[m.group(1)] = [x for p in parts for x in resolve(p)]
            except KeyError:
                unhandled.append(st)
            continue
        if (m := RX_EXTRACT.match(st)) :
            var, token = m.group(1), m.group(2)
            try:
                xp = resolve(token)
            except KeyError:
                unhandled.append(st)
                continue
            if var in cond_sums:  # EZ-branch extraction of a cond-sum var
                continue
            vars_.setdefault(var, {"kind": "scalar", "xpaths": []})["xpaths"] = xp
            continue
        if RX_LEN0_NA.match(st) or RX_AS_CHy.match(st):
            continue
        if (m := RX_RECODE.match(st)) :
            if m.group(1) in vars_:
                vars_[m.group(1)]["recode_present"] = m.group(2)
            continue
        if (m := RX_ZERO.match(st)) :
            target = vars_.get(m.group(1)) or cond_sums.get(m.group(1))
            if target is not None:
                target["rule"] = m.group(2)
            continue
        if (m := RX_SPACE_COLLAPSE.match(st)) :
            if m.group(1) in vars_:
                vars_[m.group(1)]["collapse"] = " "
            continue
        if (m := RX_CONCAT_COLLAPSE.match(st)) :
            comps = [c.strip() for c in m.group(2).split(",")]
            vars_[m.group(1)] = {"kind": "concat_collapse", "components": comps}
            continue
        if RX_EMPTY_NA.match(st):
            continue
        if (m := RX_SCHED_FLAG.match(st)) :
            vars_[m.group(1)] = {"kind": "schedule_flag", "schedule": m.group(2)}
            continue
        if re.match(r"^SCHEDN\s*<-\s*sum\(\s*grepl", st):
            vars_["SCHEDN"] = {"kind": "schedule_flag", "schedule": "IRS990ScheduleN"}
            continue

    for var, spec in cond_sums.items():
        vars_[var] = spec
    if profees_comps and profees_sym and profees_sym in sym:
        vars_["PROFEESINDEP"] = {
            "kind": "sum_with_fallback",
            "pc_components": profees_comps,
            "ez_xpaths": sym[profees_sym],
            "rule": vars_.get("PROFEESINDEP", {}).get("rule", "zeroALL"),
        }

    # special non-xpath vars
    vars_["OBJECTID"] = {"kind": "object_id_from_url"}
    vars_["URL"] = {"kind": "url"}

    # output column order from the namedList assembly (:2768-2850):
    # brace-match the call, strip comments, keep tokens that are var names
    columns: list[str] = []
    start = text.find("core <- namedList(")
    if start >= 0:
        i = text.index("(", start)
        depth, j = 0, i
        while j < len(text):
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        body_txt = re.sub(r"#[^\n]*", "", text[i + 1 : j])
        columns = [t for t in re.findall(r"[A-Z][A-Z0-9_]*", body_txt) if t in vars_]
    return {"columns": columns, "vars": vars_}, unhandled


SCHEDN_START, SCHEDN_END = 2875, 4140  # the if(SCHEDN) block
MASTER = REF.parent.parent / "MASTER_CONCORDANCE_V0.csv"

RX_SYM_Q = re.compile(r"^([A-Za-z0-9._]+)\s*<-\s*['\"]([^'\"]+)['\"]\s*$")
RX_PASTE_Q = re.compile(
    r"^([A-Za-z0-9._]+)\s*<-\s*paste\(\s*(.+?)\s*,\s*sep\s*=\s*['\"]\|['\"]\s*\)\s*$"
)
RX_SN_EXTRACT = re.compile(
    r"^(SN_[A-Z0-9_]+)\s*<-\s*xml_text\(\s*xml_find_all\(\s*(doc|nodei)\s*,\s*(.+?)\s*\)\s*\)$"
)
RX_ND = re.compile(r'nd\s*<-\s*xml_find_all\(\s*doc\s*,\s*"([^"]+)"\s*\)')


def _schedn_concrete_roots(root_names: list[str]) -> list[str]:
    """Anywhere-roots (//LiquidationDetail) → concrete absolute paths,
    scanned from the master concordance's Schedule N xpaths (the same
    crosswalk the reference's anywhere-search implicitly resolves
    against). E.g. LiquidationDetail →
    /Return/ReturnData/IRS990ScheduleN/LiquidationTable/LiquidationDetail."""
    text = MASTER.read_text(errors="replace")
    out: list[str] = []
    for m in re.finditer(r"/Return/ReturnData/IRS990ScheduleN[A-Za-z0-9/]*", text):
        parts = m.group(0).strip("/").split("/")
        for rn in root_names:
            if rn in parts:
                p = "/" + "/".join(parts[: parts.index(rn) + 1])
                if p not in out:
                    out.append(p)
    missing = [
        rn for rn in root_names if not any(g.endswith("/" + rn) for g in out)
    ]
    if missing:
        raise SystemExit(f"schedn roots not found in master concordance: {missing}")
    return sorted(out)


def _parse_named_list(section: str, anchor: str) -> tuple[list[str], list[str]]:
    """(header tokens, SN_ column tokens) from a namedList assembly."""
    start = section.find(anchor)
    if start < 0:
        raise SystemExit(f"namedList anchor {anchor!r} not found")
    i = section.index("(", start)
    depth, j = 0, i
    while j < len(section):
        if section[j] == "(":
            depth += 1
        elif section[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    body = re.sub(r"#[^\n]*", "", section[i + 1 : j])
    tokens = re.findall(r"[A-Z][A-Z0-9_]*", body)
    header = [t for t in tokens if not t.startswith("SN_")]
    cols = [t for t in tokens if t.startswith("SN_")]
    return header, cols


def parse_schedn(lines: list[str]) -> dict:
    """Parse the hand-rolled Schedule N section (reference :2875-4140):
    TABLE_00 doc-level scalars + three per-node explode loops
    (:3189-3576, :3596-4008, :4021-4134) into a declarative spec."""
    body = lines[SCHEDN_START - 1 : SCHEDN_END]
    text = "\n".join(body)
    nds = list(RX_ND.finditer(text))
    if len(nds) != 3:
        raise SystemExit(f"expected 3 nd<- statements, got {len(nds)}")
    bounds = [0] + [m.start() for m in nds] + [len(text)]
    sections = [text[bounds[i] : bounds[i + 1]] for i in range(4)]

    def parse_section(sec: str, roots: list[str] | None) -> dict:
        sym: dict[str, list[str]] = {}
        vars_: dict[str, dict] = {}
        order: list[str] = []
        root_names = [r.rsplit("/", 1)[-1] for r in (roots or [])]

        def norm_rel(p: str) -> str | None:
            """Node-relative path; reference bug-sites pass absolute
            paths to xml_find_all(nodei, ...) — recover the intended
            leaf by stripping through the group-root segment."""
            if not p.startswith("/"):
                return p
            parts = p.strip("/").split("/")
            for rn in root_names:
                if rn in parts:
                    return "/".join(parts[parts.index(rn) + 1 :])
            return None

        for st in _join_statements(sec.splitlines()):
            if (m := RX_SYM_Q.match(st)) :
                sym[m.group(1)] = m.group(2).split("|")
                continue
            if (m := RX_PASTE_Q.match(st)) :
                parts = [p.strip() for p in m.group(2).split(",")]
                acc: list[str] = []
                for p in parts:
                    if p.startswith(("'", '"')):
                        acc.extend(p.strip("'\"").split("|"))
                    elif p in sym:
                        acc.extend(sym[p])
                sym[m.group(1)] = acc
                continue
            if (m := RX_SN_EXTRACT.match(st)) :
                var, _anchor, token = m.groups()
                if token.startswith(("'", '"')):
                    paths = token.strip("'\"").split("|")
                elif token in sym:
                    paths = sym[token]
                else:
                    continue
                if roots is None:
                    spec = {"xpaths": paths}
                else:
                    rels: list[str] = []
                    for p in paths:
                        r = norm_rel(p)
                        if r and r not in rels:
                            rels.append(r)
                    spec = {"rels": rels}
                vars_[var] = spec
                order.append(var)
        return {"vars": vars_, "order": order}

    t00 = parse_section(sections[0], None)
    header, t00_cols = _parse_named_list(sections[0], "schedNtable.00 <- namedList(")
    tables: dict[str, dict] = {
        "SCHED-N-TABLE-00": {
            "cardinality": "ONE",
            "columns": t00_cols,
            "vars": {v: t00["vars"][v] for v in t00_cols},
        }
    }
    for i, nd in enumerate(nds, start=1):
        roots = _schedn_concrete_roots(
            [r.lstrip("/") for r in nd.group(1).split("|")]
        )
        sec = sections[i]
        parsed = parse_section(sec, roots)
        _, cols = _parse_named_list(sec, "var.list <- namedList(")
        tables[f"SCHED-N-TABLE-0{i}"] = {
            "cardinality": "MANY",
            "groups": roots,
            "columns": cols,
            "vars": {v: parsed["vars"][v] for v in cols},
        }
    return {"header": header, "tables": tables}


def parse_concordance(path: Path, table_prefix: str) -> list[dict]:
    """Reduce a per-table concordance CSV to the fields the planner needs
    (reference: ConcordancePartVII.csv / ConcordanceSchedJ.csv headers)."""
    with path.open() as f:
        rows = list(csv.DictReader(f))
    out = []
    for r in rows:
        if not r.get("xpath") or not r.get("rdb_table"):
            continue
        out.append(
            {
                "xpath": r["xpath"],
                "variable": r["variable_name_new"],
                "data_type": (r.get("data_type_simple") or "text").strip() or "text",
                "cardinality": (r.get("cardinality") or "ONE").strip() or "ONE",
                "rdb_table": r["rdb_table"].strip(),
                "scope": (r.get("scope") or "").strip(),
                "production_rule": (r.get("production_rule") or "").strip(),
            }
        )
    return out


def emit_master_index() -> int:
    """Compact the FULL master concordance (the crosswalk the
    reference's generic metaprogram ``create_code_chunks``
    (:5186-5291) consumes slices of) into packaged metadata:
    [VAR_NAME, LOCATION, SCOPE, XPATH] per row. With this shipped,
    the engine can build ANY master LOCATION slice at runtime via
    ``plans.concordance.register_master_table`` without consulting
    the reference tree."""
    with MASTER.open() as f:
        rows = list(csv.DictReader(f))
    compact = [
        [r["VAR_NAME"], r["LOCATION"], r["SCOPE"], r["XPATH"]]
        for r in rows
        if r.get("XPATH", "").startswith("/Return") and r.get("VAR_NAME")
    ]
    (OUT_DIR / "master_index.json").write_text(json.dumps(compact))
    return len(compact)


def main() -> None:
    lines = _read_lines()
    core, unhandled = parse_scrape(lines)
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    n_master = emit_master_index()
    print(f"master index: {n_master} xpath rows")

    n_scalar = sum(1 for v in core["vars"].values() if v.get("kind") == "scalar")
    print(
        f"core spec: {len(core['columns'])} output columns, {len(core['vars'])} vars "
        f"({n_scalar} scalar), {len(unhandled)} unhandled statements"
    )
    missing = [c for c in core["columns"] if c not in core["vars"]]
    print(f"columns missing a var spec: {missing}")
    (OUT_DIR / "core_spec.json").write_text(json.dumps(core, indent=1, sort_keys=True))

    rdb = []
    rdb += parse_concordance(REF.parent / "ConcordancePartVII.csv", "partvii")
    rdb += parse_concordance(REF.parent / "ConcordanceSchedJ.csv", "schedj")
    tables = sorted({r["rdb_table"] for r in rdb})
    print(f"rdb spec: {len(rdb)} xpath rows over tables {tables}")
    (OUT_DIR / "rdb_tables.json").write_text(json.dumps(rdb, indent=1))

    schedn = parse_schedn(lines)
    for t, spec in schedn["tables"].items():
        print(
            f"schedn spec: {t} {spec['cardinality']} "
            f"{len(spec['columns'])} vars"
            + (f" groups={spec['groups']}" if "groups" in spec else "")
        )
    (OUT_DIR / "schedn_spec.json").write_text(
        json.dumps(schedn, indent=1, sort_keys=True)
    )

    if unhandled:
        print("\nUNHANDLED (first 30):")
        for u in unhandled[:30]:
            print("  ", u[:160])


if __name__ == "__main__":
    main()
