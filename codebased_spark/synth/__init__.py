from codebased_spark.synth.pages import (  # noqa: F401
    gen_gazetteer,
    gen_pages,
    pages_from_documents,
    write_fixture,
)
