# Orthanc with the python plugin + the BOA on_change callback
FROM orthancteam/orthanc:24.12.0
COPY boa_tpu /python/boa_tpu
COPY deploy/orthanc.json /etc/orthanc/orthanc.json
ENV ORTHANC__PYTHON_SCRIPT=/python/boa_tpu/pacs/on_change.py
ENV PYTHONPATH=/python
RUN pip install --no-cache-dir celery psycopg2-binary || true
