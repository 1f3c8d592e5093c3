"""Table-format layer: snapshot-isolated commits over parquet."""

from .snapshot import SnapshotTable  # noqa: F401
