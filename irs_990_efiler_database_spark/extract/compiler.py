"""Expression compiler: xpath metadata → Catalyst Column expressions.

This replaces the reference's two extraction mechanisms — ~600 per-doc
interpreted xpath evaluations (scrapeXML, build_efile_database_functions.R:307-4149)
and R source-code generation from concordance slices (create_code_chunks,
:5186-5291) — with data-driven Column construction. Catalyst then gets a
single wide projection it can whole-stage-codegen; nested-schema pruning
drops unreferenced XML subtrees at the parse.

Expressions are composed as SQL TEXT driver-side and handed to the JVM
as one ``F.expr`` per emitted column: building the same trees out of
Column objects costs one py4j round-trip per operator — ~39k round
trips ≈ 6 s of plan-build latency for the 237-column CORE projection —
while a single parse of the equivalent SQL string is milliseconds. The
schema walk itself reads the driver-side XmlSchemaBuilder tree, so no
JVM traffic happens until the final ``F.expr``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans.xml_schema import ATTR_PREFIX, VALUE_TAG, XmlSchemaBuilder, _strip, resolve_child


def _q(name: str) -> str:
    """Backquote one field segment for SQL field access."""
    return "`" + name.replace("`", "``") + "`"


class ExprCompiler:
    def __init__(self, schema_builder: XmlSchemaBuilder, doc_col: str = "doc"):
        self.b = schema_builder
        self.doc = doc_col

    # ------------------------------------------------------ sql access

    def _walk_sql(self, xpath: str) -> tuple[str, int, str]:
        """Resolve an xpath to (sql_expr, array_depth, kind).

        array_depth counts repeated ancestors crossed (field extraction
        over an array column yields an array of the member values).
        kind ∈ {text, value, struct, attr}.
        """
        parts = _strip(xpath)
        attr: str | None = None
        if parts and parts[-1].startswith("@"):
            attr = parts[-1][1:]
            parts = parts[:-1]
        node = self.b.root
        sql = _q(self.doc)
        depth = 0
        for seg in parts:
            node = resolve_child(node, seg)
            if node is None:
                raise KeyError(f"xpath not in schema: {xpath}")
            sql = f"{sql}.{_q(seg)}"
            if node.repeated:
                depth += 1
                if depth >= 2:
                    # NESTED repeated ancestors (e.g. the derived MANY
                    # catalog marks both Schedule N's LiquidationTable
                    # and its inner LiquidationDetail): field access
                    # only resolves over array<struct>, never
                    # array<array<...>> — flatten eagerly so at most
                    # one array level is ever open. array_compact
                    # first: flatten() returns NULL when any sub-array
                    # element is null (a sibling instance without this
                    # member would otherwise null out the whole set).
                    sql = f"flatten(array_compact({sql}))"
                    depth = 1
        if attr is not None:
            if attr not in node.attrs:
                raise KeyError(f"attribute not in schema: {xpath}")
            return f"{sql}.{_q(ATTR_PREFIX + attr)}", depth, "attr"
        if node.children or node.attrs:
            if node.is_leaf or (node.attrs and not node.children):
                return f"{sql}.{_q(VALUE_TAG)}", depth, "value"
            return sql, depth, "struct"
        return sql, depth, "text"

    @staticmethod
    def _to_scalar_sql(sql: str, depth: int) -> str:
        """First non-null element across any repeated ancestors."""
        for _ in range(depth - 1):
            sql = f"flatten({sql})"
        if depth > 0:
            # get() is NULL-safe on empty arrays (element_at throws
            # under ANSI mode, the Spark 4 default)
            sql = f"get(array_compact({sql}), 0)"
        return sql

    def _scalar_sql(self, xpath: str) -> str:
        sql, depth, kind = self._walk_sql(xpath)
        if kind == "struct":
            # element with child elements has no direct text; used for
            # presence-style extraction only
            return "CAST(NULL AS STRING)"
        return self._to_scalar_sql(sql, depth)

    def _matches_array_sql(self, xpath: str) -> str:
        sql, depth, _kind = self._walk_sql(xpath)
        if depth == 0:
            return f"array_compact(array({sql}))"
        for _ in range(depth - 1):
            sql = f"flatten({sql})"
        return f"array_compact({sql})"

    def _presence_sql(self, xpath: str) -> str:
        # presence is a NODE test (the reference's length()>0 over the
        # match set), not a text test: an attribute-only element like
        # <Organization501cInd organization501cTypeTxt="3"/> IS present
        # even though its _VALUE is null — so walk to the node and stop
        # before the final _VALUE descent. Attribute xpaths keep the
        # full walk (presence = the attribute carries a value).
        parts = _strip(xpath)
        if parts and parts[-1].startswith("@"):
            sql, depth, _kind = self._walk_sql(xpath)
        else:
            sql, depth = self._walk_node_sql(xpath)
        if depth > 0:
            for _ in range(depth - 1):
                sql = f"flatten({sql})"
            return f"(size(array_compact({sql})) > 0)"
        return f"({sql} IS NOT NULL)"

    def _walk_node_sql(self, xpath: str) -> tuple[str, int]:
        """Like ``_walk_sql`` but stops at the element node itself —
        never descending into ``_VALUE`` — so callers can test node
        existence independent of element text."""
        parts = _strip(xpath)
        node = self.b.root
        sql = _q(self.doc)
        depth = 0
        for seg in parts:
            node = resolve_child(node, seg)
            if node is None:
                raise KeyError(f"xpath not in schema: {xpath}")
            sql = f"{sql}.{_q(seg)}"
            if node.repeated:
                depth += 1
                if depth >= 2:  # see _walk_sql: one open array max
                    sql = f"flatten(array_compact({sql}))"
                    depth = 1
        return sql, depth

    # ---------------------------------------------------------- access

    def _walk(self, xpath: str) -> tuple[Column, int, str]:
        """Column form of ``_walk_sql`` (builders that explode repeated
        groups use the raw column + depth directly)."""
        sql, depth, kind = self._walk_sql(xpath)
        return F.expr(sql), depth, kind

    def scalar(self, xpath: str) -> Column:
        """Text value at xpath (first match), or NULL."""
        return F.expr(self._scalar_sql(xpath))

    def matches_array(self, xpath: str) -> Column:
        """All matched text values at xpath as array<string> (for the
        reference's paste(collapse=' ') multi-match vars, :527-528)."""
        return F.expr(self._matches_array_sql(xpath))

    def presence(self, xpath: str) -> Column:
        """Does the element exist (any version/value, incl. empty
        checkbox)? — the reference's length()>0 test."""
        return F.expr(self._presence_sql(xpath))

    # ------------------------------------------------------ composites

    def _coalesce_scalar_sql(self, xpaths: list[str]) -> str:
        exprs = [self._scalar_sql(x) for x in xpaths]
        if len(exprs) == 1:
            return exprs[0]
        return f"coalesce({', '.join(exprs)})"

    def _any_present_sql(self, xpaths: list[str]) -> str:
        return "(" + " OR ".join(self._presence_sql(x) for x in xpaths) + ")"

    def _collapsed_matches_sql(self, xpaths: list[str], sep: str = " ") -> str:
        empty = "CAST(array() AS ARRAY<STRING>)"
        arrs = ", ".join(
            f"coalesce({self._matches_array_sql(x)}, {empty})" for x in xpaths
        )
        sep_lit = "'" + sep.replace("'", "''") + "'"
        return f"nullif(array_join(concat({arrs}), {sep_lit}), '')"

    def coalesce_scalar(self, xpaths: list[str]) -> Column:
        """Multi-version xpath union: versions are mutually exclusive
        within one document, so first-match == coalesce (SURVEY P2)."""
        return F.expr(self._coalesce_scalar_sql(xpaths))

    def any_present(self, xpaths: list[str]) -> Column:
        return F.expr(self._any_present_sql(xpaths))

    def collapsed_matches(self, xpaths: list[str], sep: str = " ") -> Column:
        """paste(collapse=sep) across all matches of all versions.

        Each version's match array is coalesced to [] first — concat
        over arrays is NULL if ANY argument is NULL, and absent versions
        parse to NULL arrays."""
        return F.expr(self._collapsed_matches_sql(xpaths, sep))
