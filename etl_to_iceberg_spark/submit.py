"""Control-plane: ship a Python function as a Spark job.

Re-expresses the reference's function→script conversion and spark-submit
command assembly (``/root/reference/airflow-plugins/utils/function_converter.py:12-131``,
``utils/spark_builder.py:10-124``, used by
``spark/keycloak_spark_operator.py:113-315``) without the K8s pod launch —
an orchestration concern that sits above the engine; the interfaces here
produce the artifacts it needs (a script file and a spark-submit argv).
The OAuth2 token the reference attaches to the launch lives in
:mod:`etl_to_iceberg_spark.auth` (``auth.token_env(tm.token())`` is the
env block to pass alongside :meth:`SubmitSpec.argv`).

In-process Spark needs none of this (closures serialize natively); this
surface exists for shipping work to a remote cluster.
"""

from __future__ import annotations

import inspect
import shlex
import textwrap
from collections.abc import Callable
from dataclasses import dataclass, field


def function_to_script(
    func: Callable,
    *,
    imports: list[str] | None = None,
    call_args: list[object] | None = None,
    with_session: bool = True,
) -> str:
    """Render a function as a standalone PySpark script
    (ref: ``function_converter.py:12-62``).

    The script imports what the caller declares, defines the function
    verbatim via ``inspect.getsource``, and appends a ``__main__`` block
    that builds a SparkSession (optional), calls the function, and stops
    the session.
    """
    src = textwrap.dedent(inspect.getsource(func))
    header = "\n".join(imports or [])
    args = ", ".join(repr(a) for a in (call_args or []))
    if with_session:
        call = f"{func.__name__}(spark{', ' + args if args else ''})"
        main = f"""
if __name__ == "__main__":
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.getOrCreate()
    try:
        result = {call}
        if result is not None:
            print(result)
    finally:
        spark.stop()
"""
    else:
        main = f"""
if __name__ == "__main__":
    result = {func.__name__}({args})
    if result is not None:
        print(result)
"""
    return (header + "\n\n" if header else "") + src + main


@dataclass
class SubmitSpec:
    """spark-submit assembly (ref: ``spark_builder.py:10-124``)."""

    script_path: str
    master: str | None = None
    deploy_mode: str | None = None
    app_name: str | None = None
    conf: dict[str, str] = field(default_factory=dict)
    packages: list[str] = field(default_factory=list)
    jars: list[str] = field(default_factory=list)
    py_files: list[str] = field(default_factory=list)
    app_args: list[str] = field(default_factory=list)

    def argv(self) -> list[str]:
        cmd = ["spark-submit"]
        if self.master:
            cmd += ["--master", self.master]
        if self.deploy_mode:
            cmd += ["--deploy-mode", self.deploy_mode]
        if self.app_name:
            cmd += ["--name", self.app_name]
        for k, v in sorted(self.conf.items()):
            cmd += ["--conf", f"{k}={v}"]
        if self.packages:
            cmd += ["--packages", ",".join(self.packages)]
        if self.jars:
            cmd += ["--jars", ",".join(self.jars)]
        if self.py_files:
            cmd += ["--py-files", ",".join(self.py_files)]
        cmd.append(self.script_path)
        cmd += self.app_args
        return cmd

    def command(self) -> str:
        return " ".join(shlex.quote(a) for a in self.argv())
