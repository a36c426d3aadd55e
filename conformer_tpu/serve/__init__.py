"""Serving: REST + WebSocket + Gradio front-ends over per-session state.

Rebuilds the reference L5 layer (SURVEY.md §1, §3.3-3.4) — Django REST
endpoint, websockets streaming server, Gradio mic demo — without the global
mutable-model race (§5.2): every connection owns an immutable
StreamingSession pytree.
"""
