from .engine import ContinuousBatchingEngine, PagePool, Request
