"""Reference smoke invariant 2 (code distribution): the custom-image
example bakes ``my_library.func(x) -> [i+1 for i in x]`` into the worker
image (``/root/reference/example/custom_image/``); our equivalent ships
the module with ``addPyFile`` and imports it inside an Arrow-batched
executor function — same result [1..100], no image build."""

from __future__ import annotations

import textwrap


def test_addpyfile_distributes_user_module(spark, tmp_path):
    lib = tmp_path / "my_library_spark.py"
    lib.write_text(
        textwrap.dedent(
            """
            def func(xs):
                return [i + 1 for i in xs]
            """
        )
    )
    spark.sparkContext.addPyFile(str(lib))

    def apply_lib(batches):
        import my_library_spark  # resolved from the shipped py-file

        for pdf in batches:
            pdf["id"] = my_library_spark.func(list(pdf["id"]))
            yield pdf

    out = (
        spark.range(100)
        .repartition(4)  # exercise multiple executor tasks
        .mapInPandas(apply_lib, "id long")
        .orderBy("id")
        .collect()
    )
    # reference invariant: func(range(100)) == [1..100]
    assert [r.id for r in out] == list(range(1, 101))
