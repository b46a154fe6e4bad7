"""Hierarchy operators: transitive closure, breadcrumbs, level columns.

Reference parity (SURVEY.md §2.5):

- H1 transitive closure — the reference expresses it as a DuckDB
  ``WITH RECURSIVE`` CTE (``/root/reference/SAMPLE-REPORTS.md:59-75``,
  ``SAMPLE-PROJECT-BUDGET-REPORT.md:54-70``): base = every task is its own
  ancestor; step = join the working set to tasks on ancestor = task_id and
  emit the parent as a further ancestor.
- H2 breadcrumb path — a Python parent-walk with a ``visited`` cycle guard
  (``/root/reference/dlt_fetch_timecamp.py:527-547``, groups variant
  ``:313-342``).
- H3 denormalization — ``" / ".join(path)`` plus fixed-depth level columns
  (``/root/reference/dlt_fetch_timecamp.py:554-567``).

Spark-first design
------------------
Spark 4 has native recursive CTEs, but the closure is also a library
operator here (`transitive_closure`) built as a bounded iterative loop of
broadcast self-joins:

- The hierarchy table is a *dimension* — even at 100 TB of facts, the tasks
  dim is millions of rows at most, so each iteration's join broadcasts the
  (node → parent) edge list: zero shuffles, and the loop runs ``max_depth``
  (reference caps at 8) rounds.
- `localCheckpoint` after each round cuts the lineage so the final plan
  doesn't nest ``max_depth`` joins (keeps codegen + planning time flat).
- Cycle safety: the walk carries a ``_visited`` id array and stops a branch
  when the next ancestor is already in it — same semantics as the
  reference's ``visited`` set — plus the hard depth bound.

The closure output is small ⇒ callers should ``F.broadcast`` it when joining
facts against it (done in plans/reports.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_DEPTH = 8


def transitive_closure(
    tasks: DataFrame,
    id_col: str = "task_id",
    parent_col: str = "parent_id",
    max_depth: int = DEFAULT_MAX_DEPTH,
    include_self: bool = True,
) -> DataFrame:
    """Ancestor/descendant closure of an adjacency-list hierarchy.

    Returns (descendant_id, ancestor_id, depth): depth 0 is the self-pair,
    depth 1 the parent, etc. ``parent_col`` must already be canonicalized
    (''/'0' → NULL — see operators.canonicalize.null_canonical).
    """
    edges = (
        tasks.select(
            F.col(id_col).alias("_node"),
            F.col(parent_col).alias("_parent"),
        )
        .filter(F.col("_parent").isNotNull())
        .localCheckpoint(eager=True)
    )

    base = tasks.select(
        F.col(id_col).alias("descendant_id"),
        F.col(id_col).alias("ancestor_id"),
        F.lit(0).alias("depth"),
        F.array(F.col(id_col)).alias("_visited"),
    )
    levels = [base]
    frontier = base
    for d in range(1, max_depth + 1):
        frontier = (
            frontier.alias("f")
            .join(
                F.broadcast(edges).alias("e"),
                F.col("f.ancestor_id") == F.col("e._node"),
            )
            .filter(~F.array_contains(F.col("f._visited"), F.col("e._parent")))
            .select(
                F.col("f.descendant_id"),
                F.col("e._parent").alias("ancestor_id"),
                F.lit(d).alias("depth"),
                F.array_append(F.col("f._visited"), F.col("e._parent")).alias("_visited"),
            )
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        levels.append(frontier)

    out = reduce(DataFrame.unionByName, levels).drop("_visited")
    if not include_self:
        out = out.filter(F.col("depth") > 0)
    return out


def closure_sql(tasks_cte: str, max_depth: int = DEFAULT_MAX_DEPTH) -> str:
    """ANSI ``WITH RECURSIVE`` equivalent of `transitive_closure` (depth
    bound + visited-array cycle guard), runnable by DuckDB and Spark ≥ 4.

    ``tasks_cte`` is a SELECT producing (task_id, parent_id). The returned
    text is a full CTE chain ending in ``task_hierarchy``; embed it as
    ``WITH RECURSIVE {closure_sql(...)} SELECT ... FROM task_hierarchy``.
    """
    return f"""
_tasks AS ({tasks_cte}),
task_hierarchy(descendant_id, ancestor_id, depth) AS (
    SELECT task_id, task_id, 0 FROM _tasks
    UNION ALL
    SELECT th.descendant_id, t.parent_id, th.depth + 1
    FROM task_hierarchy th
    JOIN _tasks t ON th.ancestor_id = t.task_id
    WHERE t.parent_id IS NOT NULL AND th.depth < {max_depth}
)
""".strip()


def breadcrumbs(
    tasks: DataFrame,
    id_col: str = "task_id",
    parent_col: str = "parent_id",
    name_col: str = "name",
    max_depth: int = DEFAULT_MAX_DEPTH,
    n_levels: int = 8,
    sep: str = " / ",
    prefix: str = "task",
) -> DataFrame:
    """Denormalized breadcrumb columns for every node of a hierarchy.

    Output: input columns + ``{prefix}_breadcrumb`` (root→leaf names joined
    by ``sep``) + ``{prefix}_level_1..n_levels`` ('' beyond actual depth).
    Missing parents end the walk (reference yields the partial path);
    a repeated ancestor id ends it too (cycle guard).
    """
    dim = (
        tasks.select(
            F.col(id_col).alias("_node"),
            F.col(parent_col).alias("_parent"),
            F.col(name_col).alias("_name"),
        )
        .localCheckpoint(eager=True)
    )

    walk = dim.select(
        F.col("_node").alias("_id"),
        F.array(F.col("_name")).alias("_path"),
        F.array(F.col("_node")).alias("_visited"),
        F.col("_parent").alias("_cursor"),
    )
    for _ in range(max_depth):
        if walk.filter(F.col("_cursor").isNotNull()).isEmpty():
            break
        p = F.col("p._node")
        walk = (
            walk.alias("w")
            .join(F.broadcast(dim).alias("p"), F.col("w._cursor") == p, "left")
            .select(
                F.col("w._id").alias("_id"),
                F.when(p.isNull(), F.col("w._path"))
                .otherwise(F.concat(F.array(F.col("p._name")), F.col("w._path")))
                .alias("_path"),
                F.when(p.isNull(), F.col("w._visited"))
                .otherwise(F.array_append(F.col("w._visited"), p))
                .alias("_visited"),
                F.when(
                    p.isNull() | F.array_contains(F.col("w._visited"), F.col("p._parent")),
                    F.lit(None).cast("string"),
                )
                .otherwise(F.col("p._parent"))
                .alias("_cursor"),
            )
            .localCheckpoint(eager=True)
        )

    crumbs = walk.select(
        F.col("_id"),
        F.concat_ws(sep, F.col("_path")).alias(f"{prefix}_breadcrumb"),
        *[
            F.coalesce(F.try_element_at(F.col("_path"), F.lit(i)), F.lit("")).alias(
                f"{prefix}_level_{i}"
            )
            for i in range(1, n_levels + 1)
        ],
    )
    return tasks.join(crumbs, tasks[id_col] == crumbs["_id"], "left").drop("_id")
