"""PACS service layer: Orthanc callback → queue → worker → sinks.

Parity: `scripts/` in the reference (on_change_callback.py, celery_task.py,
util.py) — same architecture (Orthanc STABLE_SERIES gating → task queue →
worker running analyze_ct → DICOMweb/SMB/Postgres sinks) with the queue
backend pluggable: Celery+RabbitMQ when installed, a local thread/spool
queue otherwise.
"""
