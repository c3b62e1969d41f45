# seekr_tpu container (counterpart of the reference Dockerfile, which is
# python-slim + pip install seekr + jupyter).  For TPU hosts, start FROM a
# libtpu-enabled base instead and drop the jax[cpu] extra.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/seekr_tpu
COPY . .
RUN pip install --no-cache-dir "jax[cpu]" && \
    pip install --no-cache-dir . jupyter

# pre-build the native C++ components (Leiden + fasta encoder)
RUN python -c "from seekr_tpu import native; assert native.native_available()"

EXPOSE 8888
CMD ["jupyter", "notebook", "--ip=0.0.0.0", "--allow-root", "--no-browser"]
