"""Table-format layer: snapshot-isolated commits over parquet."""

from .group import SnapshotGroup  # noqa: F401
from .snapshot import SnapshotBranch, SnapshotTable  # noqa: F401
