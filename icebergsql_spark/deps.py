"""Column dependencies: parsing, validation, and derived-predicate inference.

The reference's only original optimization (SURVEY.md §4): the table option
``columnDependencies "srcCol=destCol:transform, ..."`` declares that
``destCol = transform(srcCol)`` holds for every row, letting a predicate on
srcCol imply one on destCol, which then drives extra file pruning through
destCol's min/max stats.

  - option grammar + validation → /root/reference/src/main/scala/org/apache/
    spark/sql/iceberg/utils/Transforms.scala:46-110 (resolve both columns
    against the schema case-insensitively, parse the transform, aggregate
    error messages)
  - predicate augmentation → utils/ColumnDependenciesExprVisitor.scala:47-66
    (for each bound predicate on srcCol, AND in transform.project(destCol,
    pred))

Example from the reference README (:160-180): with
``ss_sold_date_sk=ss_sold_month:truncate[2]``, the filter
``ss_sold_date_sk = '0906245'`` derives ``ss_sold_month = '09'``.
"""

from __future__ import annotations

from icebergsql_spark.expressions import (
    And,
    Comparison,
    In,
    Pred,
    and_all,
)
from icebergsql_spark.transforms import Transform, parse_transform


class ColumnDependencyError(ValueError):
    pass


def parse_column_dependencies(
    option: str, schema_cols: list[str]
) -> dict[str, dict[str, Transform]]:
    """Parse ``src=dest:transform, ...`` → {src: {dest: Transform}}.

    Collects ALL errors before raising (the reference returns an
    Either[Array[String], ...] aggregating messages the same way).
    """
    lower_map = {c.lower(): c for c in schema_cols}
    deps: dict[str, dict[str, Transform]] = {}
    errors: list[str] = []
    for raw in option.split(","):
        entry = raw.strip()
        if not entry:
            continue
        if "=" not in entry or ":" not in entry.split("=", 1)[1]:
            errors.append(f"malformed dependency {entry!r}; expected src=dest:transform")
            continue
        src, rest = entry.split("=", 1)
        dest, transform_text = rest.split(":", 1)
        src, dest = src.strip(), dest.strip()
        src_col = lower_map.get(src.lower())
        dest_col = lower_map.get(dest.lower())
        if src_col is None:
            errors.append(f"unknown source column {src!r} in dependency {entry!r}")
        if dest_col is None:
            errors.append(f"unknown destination column {dest!r} in dependency {entry!r}")
        try:
            transform = parse_transform(transform_text)
        except ValueError as e:
            errors.append(str(e))
            transform = None
        if src_col and dest_col and transform:
            deps.setdefault(src_col, {})[dest_col] = transform
    if errors:
        raise ColumnDependencyError("; ".join(errors))
    return deps


def augment_predicate(pred: Pred, deps: dict[str, dict[str, Transform]]) -> Pred:
    """AND derived predicates onto ``pred``.

    Walks the tree; for each Comparison/In on a source column with declared
    dependencies, attaches the projected predicate on each destination
    column. Derivation is applied inside the node's own position so OR
    branches stay sound: (a=1 OR a=2) becomes
    ((a=1 AND m=T(1)) OR (a=2 AND m=T(2))).
    """
    from icebergsql_spark.expressions import Not, Or

    if isinstance(pred, And):
        return And(augment_predicate(pred.left, deps), augment_predicate(pred.right, deps))
    if isinstance(pred, Or):
        return Or(augment_predicate(pred.left, deps), augment_predicate(pred.right, deps))
    if isinstance(pred, Not):
        return pred  # projection under negation is not sound — leave as-is
    if isinstance(pred, Comparison):
        derived: list[Pred] = [pred]
        for dest, transform in deps.get(pred.col, {}).items():
            try:
                projected = transform.project(pred.op, pred.value)
            except TypeError:
                projected = None
            if projected is not None:
                derived.append(Comparison(projected[0], dest, projected[1]))
        return and_all(derived)
    if isinstance(pred, In):
        derived = [pred]
        for dest, transform in deps.get(pred.col, {}).items():
            try:
                values = tuple(transform.apply(v) for v in pred.values)
            except TypeError:
                continue
            derived.append(In(dest, values))
        return and_all(derived)
    return pred
