from .server import BatchingWorker, TaggerServer

__all__ = ["BatchingWorker", "TaggerServer"]
