"""Right-to-be-forgotten (GDPR erasure) propagation.

The reference has no deletion story at all — its DW only ever upserts
(``/root/reference/python/03_upsert_dw_pedidos.py``). A compliant
warehouse needs the inverse: given a set of subject keys, remove every
row belonging to them from every table that carries the key, and leave
an auditable record that the erasure ran.

Scale shape: the forget-set is tiny (a legal request, not a data
set), so every table purges with a BROADCAST anti-join — one scan per
table, no shuffle of the table itself, 100 TB tables included. With
the versioned store (``io/versioned.py``) the purge is committed as a
new version; note the retention interplay: erasure is only complete
once pre-purge versions are vacuumed past their retention window —
time travel and the right to erasure are in direct tension, and the
vacuum horizon is the compliance knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def forget_keys(
    tables: dict[str, tuple[DataFrame, str]],
    forget: DataFrame,
    forget_col: str,
) -> dict[str, DataFrame]:
    """Purge every table of rows whose key appears in ``forget``.

    ``tables`` maps a table name to ``(df, key_col)``; ``forget`` is
    the subject-key set (one column, ``forget_col``). Returns the
    purged frames keyed by the same names. NULL keys are retained —
    they belong to no subject.
    """
    # rename the key so the anti-join condition stays unambiguous even
    # when the forget-set is derived from the table being purged
    keys = F.broadcast(
        forget.select(F.col(forget_col).alias("__forget_key")).distinct()
    )
    out = {}
    for name, (df, key_col) in tables.items():
        out[name] = df.join(
            keys, F.col(key_col) == F.col("__forget_key"), "left_anti"
        )
    return out
