# platipy_tpu service image: REST backend + DICOM listener.
#
# Counterpart of the reference's service.Dockerfile:1-38, with the
# redis/celery/gunicorn trio replaced by the framework's stdlib backend:
# the ThreadingHTTPServer REST API (backend/api.py), the in-process
# TaskRunner (backend/tasks.py), and the from-scratch DIMSE listener
# (dicom/communication/) — no external broker is required, so the image
# is a single process tree.
FROM platipy_tpu/platipy_tpu

COPY entrypoint.sh /entrypoint.sh
RUN chmod +x /entrypoint.sh

ENV LANG=C.UTF-8
ENV LC_ALL=C.UTF-8

ARG dicom_listen_port=7777
ENV DICOM_LISTEN_PORT=${dicom_listen_port}
ENV DICOM_LISTEN_AET=PLATIPY_SERVICE

# `manage` mirrors the reference's /usr/bin/manage shim
# (reference service.Dockerfile:21-23).
RUN printf '#!/bin/bash\npython -m platipy_tpu.backend.manage "$@"\n' > /usr/bin/manage && \
    chmod +x /usr/bin/manage

EXPOSE 8000
EXPOSE ${dicom_listen_port}

ENV PYTHONPATH=/home/service
WORKDIR /home/service
ENV WORK=/data
RUN mkdir -p /logs /data && chmod 0777 /logs /data

ENTRYPOINT ["/entrypoint.sh"]
CMD ["manage"]
