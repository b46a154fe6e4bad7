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
operator here (`transitive_closure`) built as a bounded *lazy* unroll of
broadcast self-joins:

- The hierarchy table is a *dimension* — even at 100 TB of facts, the tasks
  dim is millions of rows at most, so each iteration's join broadcasts the
  (node → parent) edge list: zero shuffles, and the unroll runs
  ``max_depth`` (reference caps at 8) rounds.
- The unroll is fully lazy: no ``localCheckpoint``/``isEmpty`` inside the
  loop, so building the closure schedules ZERO jobs — the whole consumer
  query (closure + fact join + agg) runs as ONE Spark job. Eager
  per-iteration checkpointing cost ~2 blocking jobs × max_depth on a
  3-level tree (~3-4 s of pure scheduling at sf0.1); the lazy plan is a
  linear chain of broadcast joins whose edge-side broadcast exchange is
  built once and reused (ReuseExchange). For *unbounded* hierarchies pass
  ``checkpoint_every`` to cut lineage periodically.
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

def _as_view(df: DataFrame, tag: str) -> str:
    """Register a DataFrame under a temp-view name keyed by the INPUT
    PLAN's semantic hash.

    ``spark.sql`` analyzes eagerly, so the returned DataFrame binds the
    view's current definition at call time — a later call re-registering
    the same name cannot retroactively change an earlier closure. The
    semantic hash keeps the name (hence the generated SQL text, hence
    the codegen/JIT classes) stable across repeated calls on the same
    input — the point of the round-7 stable-name change — while two
    concurrent calls on DIFFERENT inputs get different names instead of
    interleaving createOrReplaceTempView/spark.sql on one shared name
    and binding one query to the other's edge table (round-7 ADVICE
    item 4; same-input concurrent registration stays a benign race —
    both register the identical definition)."""
    name = f"__hier_{tag}_{df.semanticHash() & 0x7FFFFFFF:x}"
    df.createOrReplaceTempView(name)
    return name


def _native_recursive_cte(df: DataFrame) -> bool:
    try:
        return int(df.sparkSession.version.split(".")[0]) >= 4
    except ValueError:  # non-standard version string — feature-probe instead
        try:
            df.sparkSession.sql(
                "WITH RECURSIVE __p(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM __p "
                "WHERE n < 2) SELECT 1 WHERE FALSE"
            ).collect()
            return True
        except Exception:
            return False


def transitive_closure(
    tasks: DataFrame,
    id_col: str = "task_id",
    parent_col: str = "parent_id",
    max_depth: int = DEFAULT_MAX_DEPTH,
    include_self: bool = True,
    checkpoint_every: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Ancestor/descendant closure of an adjacency-list hierarchy.

    Returns (descendant_id, ancestor_id, depth): depth 0 is the self-pair,
    depth 1 the parent, etc. ``parent_col`` must already be canonicalized
    (''/'0' → NULL — see operators.canonicalize.null_canonical).

    Two physical strategies with identical semantics (cycle guard + depth
    cap included):

    - ``recursive_cte`` (default on Spark ≥ 4): native ``WITH RECURSIVE``
      — the engine iterates a working table and *stops when the frontier
      empties*, so a 3-level tree costs 3 rounds regardless of
      ``max_depth``, in one job. The recursive member carries a BROADCAST
      hint on the dimension side: CTE rounds don't AQE-coalesce, so the
      default sort-merge join would pay a full spark.sql.shuffle.partitions
      exchange of a near-empty frontier EVERY round (measured 3× the whole
      closure cost); the hierarchy dim is dimension-sized by definition,
      so broadcasting it makes each round shuffle-free.
    - ``unroll``: a lazy chain of ``max_depth`` broadcast self-joins —
      portable to any Spark, and the broadcast edge exchange is reused
      across rounds; costs O(max_depth) plan nodes even for shallow trees.
      Set ``checkpoint_every=k`` to cut lineage on deep hierarchies.
    """
    if strategy not in ("auto", "recursive_cte", "unroll"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy in ("auto", "recursive_cte") and _native_recursive_cte(tasks):
        v = _as_view(
            tasks.select(
                F.col(id_col).alias("_node"), F.col(parent_col).alias("_parent")
            ),
            "closure",
        )
        out = tasks.sparkSession.sql(
            f"""
            WITH RECURSIVE __closure(descendant_id, ancestor_id, depth, _visited) AS (
                SELECT _node, _node, 0, array(_node) FROM {v}
                UNION ALL
                SELECT /*+ BROADCAST(t) */ c.descendant_id, t._parent, c.depth + 1,
                       array_append(c._visited, t._parent)
                FROM __closure c JOIN {v} t ON c.ancestor_id = t._node
                WHERE t._parent IS NOT NULL
                  AND NOT array_contains(c._visited, t._parent)
                  AND c.depth < {int(max_depth)}
            )
            SELECT descendant_id, ancestor_id, depth FROM __closure
            """
        )
        if not include_self:
            out = out.filter(F.col("depth") > 0)
        return out

    edges = tasks.select(
        F.col(id_col).alias("_node"),
        F.col(parent_col).alias("_parent"),
    ).filter(F.col("_parent").isNotNull())

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
        )
        if checkpoint_every and d % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=False)
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
    strategy: str = "auto",
) -> DataFrame:
    """Denormalized breadcrumb columns for every node of a hierarchy.

    Output: input columns + ``{prefix}_breadcrumb`` (root→leaf names joined
    by ``sep``) + ``{prefix}_level_1..n_levels`` ('' beyond actual depth).
    Missing parents end the walk (reference yields the partial path);
    a repeated ancestor id ends it too (cycle guard).

    Strategies as in `transitive_closure`: native ``WITH RECURSIVE`` walk
    (rounds = actual depth) on Spark ≥ 4, else a lazy linear chain of
    ``max_depth`` broadcast left joins where a finished row (NULL cursor)
    passes through the remaining joins unchanged.
    """
    if strategy not in ("auto", "recursive_cte", "unroll"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy in ("auto", "recursive_cte") and _native_recursive_cte(tasks):
        v = _as_view(
            tasks.select(
                F.col(id_col).alias("_node"),
                F.col(parent_col).alias("_parent"),
                F.col(name_col).alias("_name"),
            ),
            "crumb",
        )
        # walk upward; a branch retires by taking _cursor NULL (root reached
        # or cycle detected), which simply stops matching the recursive join
        walk_sql = tasks.sparkSession.sql(
            f"""
            WITH RECURSIVE __walk(_id, _path, _visited, _cursor, _d) AS (
                SELECT _node, array(_name), array(_node), _parent, 0 FROM {v}
                UNION ALL
                SELECT /*+ BROADCAST(p) */ w._id,
                       array_prepend(w._path, p._name),
                       array_append(w._visited, p._node),
                       CASE WHEN p._parent IS NULL
                              OR array_contains(w._visited, p._parent)
                            THEN CAST(NULL AS STRING) ELSE p._parent END,
                       w._d + 1
                FROM __walk w JOIN {v} p ON w._cursor = p._node
                WHERE w._d < {int(max_depth)}
            )
            SELECT _id, _path
            FROM (
                SELECT _id, _path,
                       ROW_NUMBER() OVER (PARTITION BY _id ORDER BY _d DESC) AS _rn
                FROM __walk
            ) WHERE _rn = 1
            """
        )
        crumbs = walk_sql.select(
            F.col("_id"),
            F.concat_ws(sep, F.col("_path")).alias(f"{prefix}_breadcrumb"),
            *[
                F.coalesce(F.try_element_at(F.col("_path"), F.lit(i)), F.lit("")).alias(
                    f"{prefix}_level_{i}"
                )
                for i in range(1, n_levels + 1)
            ],
        )
        return tasks.join(
            F.broadcast(crumbs), tasks[id_col] == crumbs["_id"], "left"
        ).drop("_id")

    dim = tasks.select(
        F.col(id_col).alias("_node"),
        F.col(parent_col).alias("_parent"),
        F.col(name_col).alias("_name"),
    )

    walk = dim.select(
        F.col("_node").alias("_id"),
        F.array(F.col("_name")).alias("_path"),
        F.array(F.col("_node")).alias("_visited"),
        F.col("_parent").alias("_cursor"),
    )
    for _ in range(max_depth):
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
