from .tracker import JDETracker, STrack

__all__ = ["JDETracker", "STrack"]
