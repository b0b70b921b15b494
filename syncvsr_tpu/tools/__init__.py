"""Offline preprocessing tools (mp4 -> pkl, landmarks, transcripts).

These run once on CPU/GPU hosts; heavyweight detectors (mediapipe FaceMesh,
YOLOv8-face, whisperX) are optional dependencies gated at import. The pure
crop geometry is dependency-free and unit-tested.
"""
