"""Explicit StructTypes for the reference's five bronze sources.

The reference infers schemas via ``pandas.read_csv``
(reference: pipelines/ingest_bronze.py:14,24,34,44,58); we declare them
(SURVEY.md §1.3) so ingestion is deterministic and oracle-matchable.
Column names/semantics follow FIXTURES.md / reference README.md:39-84.
"""

from __future__ import annotations

from pyspark.sql import types as T

# reference: README.md:39-45 (pai_job_table.csv -> bronze_job_events)
JOBS = T.StructType(
    [
        T.StructField("job_name", T.StringType(), False),
        T.StructField("inst_id", T.StringType(), False),
        T.StructField("user", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("start_time", T.DoubleType(), True),
        # NULL while the job is still running (silver_jobs.sql:25-28 null guard)
        T.StructField("end_time", T.DoubleType(), True),
    ]
)

# reference: README.md:50-57 (pai_machine_metric.csv -> bronze_machine_metrics)
MACHINE_METRICS = T.StructType(
    [
        T.StructField("worker_name", T.StringType(), False),
        T.StructField("machine", T.StringType(), False),
        T.StructField("start_time", T.DoubleType(), True),
        T.StructField("end_time", T.DoubleType(), True),
        T.StructField("machine_gpu", T.DoubleType(), True),
        T.StructField("machine_cpu", T.DoubleType(), True),
        T.StructField("machine_cpu_iowait", T.DoubleType(), True),
        T.StructField("machine_cpu_kernel", T.DoubleType(), True),
        T.StructField("machine_cpu_usr", T.DoubleType(), True),
        T.StructField("machine_load_1", T.DoubleType(), True),
        T.StructField("machine_net_receive", T.DoubleType(), True),
        T.StructField("machine_num_worker", T.LongType(), True),
    ]
)

# reference: README.md:47-48 (pai_instance_table.csv, bronze-only)
INSTANCES = T.StructType(
    [
        T.StructField("inst_id", T.StringType(), False),
        T.StructField("job_name", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("start_time", T.DoubleType(), True),
        T.StructField("end_time", T.DoubleType(), True),
    ]
)

# reference: README.md:59-60 (pai_machine_spec.csv, bronze-only dimension)
MACHINE_SPECS = T.StructType(
    [
        T.StructField("machine", T.StringType(), False),
        T.StructField("cap_cpu", T.LongType(), True),
        T.StructField("cap_mem", T.LongType(), True),
        T.StructField("cap_gpu", T.LongType(), True),
    ]
)

# reference: README.md:71-81 (tpu_gpus.csv -> bronze_gpu_specs; all strings,
# compound fields are the string-function test bed)
GPU_SPECS = T.StructType(
    [
        T.StructField("Product_Name", T.StringType(), True),
        T.StructField("GPU_Chip", T.StringType(), True),
        T.StructField("Released", T.StringType(), True),
        T.StructField("Bus", T.StringType(), True),
        T.StructField("Memory", T.StringType(), True),
        T.StructField("GPU_clock", T.StringType(), True),
        T.StructField("Memory_clock", T.StringType(), True),
        T.StructField("Shaders_TMUs_ROPs", T.StringType(), True),
    ]
)

BRONZE_SOURCES: dict[str, T.StructType] = {
    "bronze_job_events": JOBS,
    "bronze_instance_table": INSTANCES,
    "bronze_machine_metrics": MACHINE_METRICS,
    "bronze_machine_spec": MACHINE_SPECS,
    "bronze_gpu_specs": GPU_SPECS,
}
