from .server import BatchingWorker, QueueFullError, TaggerServer

__all__ = ["BatchingWorker", "QueueFullError", "TaggerServer"]
