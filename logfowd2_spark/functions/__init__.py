from logfowd2_spark.functions.kernels import (  # noqa: F401
    K8S_PATH_RE,
    LOG_LINE_RE,
    extract_k8s_meta,
    grok_line,
    sanitize_content,
    truncate_line,
)
