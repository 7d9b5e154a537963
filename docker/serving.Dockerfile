# Serving container — parity with the reference's docker/serving.Dockerfile
# (python-slim + numpy only, no torch): the stdlib HTTP surface needs ONLY
# numpy; install jax[tpu] instead for on-device scoring deployments.
FROM python:3.12-slim

WORKDIR /app
RUN pip install --no-cache-dir numpy

COPY plotpointe_tpu/serving/ plotpointe_tpu/serving/
COPY plotpointe_tpu/utils/ plotpointe_tpu/utils/
COPY plotpointe_tpu/__init__.py plotpointe_tpu/__init__.py

ENV PYTHONPATH=/app
ENV PLOTPOINTE_STDLIB_HTTP=1
EXPOSE 8080
CMD ["python", "-m", "plotpointe_tpu.serving"]
