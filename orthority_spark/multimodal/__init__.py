"""Multimodal binary-column operators (decode / feature / resize stubs)."""
