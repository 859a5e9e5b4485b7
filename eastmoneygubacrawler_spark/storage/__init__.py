from .backend import SnapshotStore  # noqa: F401
