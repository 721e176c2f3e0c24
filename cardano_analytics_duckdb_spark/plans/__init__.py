from .session import get_session, session_builder

__all__ = ["get_session", "session_builder"]
