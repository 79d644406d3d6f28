"""Expression compiler: xpath metadata → Catalyst Column expressions.

This replaces the reference's two extraction mechanisms — ~600 per-doc
interpreted xpath evaluations (scrapeXML, build_efile_database_functions.R:307-4149)
and R source-code generation from concordance slices (create_code_chunks,
:5186-5291) — with data-driven Column construction. Catalyst then gets a
single wide projection it can whole-stage-codegen; nested-schema pruning
drops unreferenced XML subtrees at the parse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans.xml_schema import ATTR_PREFIX, VALUE_TAG, XmlSchemaBuilder, _strip


class ExprCompiler:
    def __init__(self, schema_builder: XmlSchemaBuilder, doc_col: str = "doc"):
        self.b = schema_builder
        self.doc = doc_col

    # ---------------------------------------------------------- access

    def _walk(self, xpath: str) -> tuple[Column, int, str]:
        """Resolve an xpath to (column, array_depth, kind).

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
        col = F.col(self.doc)
        depth = 0
        for seg in parts:
            node = node.children.get(seg)
            if node is None:
                raise KeyError(f"xpath not in schema: {xpath}")
            col = col[seg]
            if node.repeated:
                depth += 1
        if attr is not None:
            if attr not in node.attrs:
                raise KeyError(f"attribute not in schema: {xpath}")
            return col[ATTR_PREFIX + attr], depth, "attr"
        if node.children or node.attrs:
            if node.is_leaf or (node.attrs and not node.children):
                return col[VALUE_TAG], depth, "value"
            return col, depth, "struct"
        return col, depth, "text"

    def _to_scalar(self, col: Column, depth: int) -> Column:
        """First non-null element across any repeated ancestors."""
        for _ in range(depth - 1):
            col = F.flatten(col)
        if depth > 0:
            # F.get is NULL-safe on empty arrays (element_at throws
            # under ANSI mode, the Spark 4 default)
            col = F.get(F.array_compact(col), 0)
        return col

    def scalar(self, xpath: str) -> Column:
        """Text value at xpath (first match), or NULL."""
        col, depth, kind = self._walk(xpath)
        if kind == "struct":
            # element with child elements has no direct text; used for
            # presence-style extraction only
            return F.lit(None).cast("string")
        return self._to_scalar(col, depth)

    def matches_array(self, xpath: str) -> Column:
        """All matched text values at xpath as array<string> (for the
        reference's paste(collapse=' ') multi-match vars, :527-528)."""
        col, depth, kind = self._walk(xpath)
        if depth == 0:
            return F.array_compact(F.array(col))
        for _ in range(depth - 1):
            col = F.flatten(col)
        return F.array_compact(col)

    def presence(self, xpath: str) -> Column:
        """Does the element exist (any version/value, incl. empty
        checkbox)? — the reference's length()>0 test."""
        col, depth, _kind = self._walk(xpath)
        if depth > 0:
            for _ in range(depth - 1):
                col = F.flatten(col)
            return F.size(F.array_compact(col)) > 0
        return col.isNotNull()

    # ------------------------------------------------------ composites

    def coalesce_scalar(self, xpaths: list[str]) -> Column:
        """Multi-version xpath union: versions are mutually exclusive
        within one document, so first-match == coalesce (SURVEY P2)."""
        cols = [self.scalar(x) for x in xpaths]
        return cols[0] if len(cols) == 1 else F.coalesce(*cols)

    def any_present(self, xpaths: list[str]) -> Column:
        cond = self.presence(xpaths[0])
        for x in xpaths[1:]:
            cond = cond | self.presence(x)
        return cond

    def collapsed_matches(self, xpaths: list[str], sep: str = " ") -> Column:
        """paste(collapse=sep) across all matches of all versions.

        Each version's match array is coalesced to [] first — F.concat
        over arrays is NULL if ANY argument is NULL, and absent versions
        parse to NULL arrays."""
        empty = F.array().cast("array<string>")
        arr = F.concat(
            *[F.coalesce(self.matches_array(x), empty) for x in xpaths]
        )
        joined = F.array_join(arr, sep)
        return F.nullif(joined, F.lit(""))
