"""Stream source/sink factories (SURVEY.md S10/S11)."""

from .task_stream import decode_task_records, encode_task_records, task_sink, task_stream

__all__ = ["task_stream", "task_sink", "decode_task_records", "encode_task_records"]
