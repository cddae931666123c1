from .replay import replay_to_memory  # noqa: F401
