import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_file(tmp_path_factory):
    """1,000-row deterministic corpus parquet (multi row group)."""
    from lucene_ray.fixtures import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    path = str(d / "corpus.parquet")
    write_corpus(path, 1000, row_group_size=130)
    return path


@pytest.fixture(scope="session")
def built_index(ray_session, corpus_file, tmp_path_factory):
    """Index built over the 1,000-row corpus with small partitions so we get
    multiple partitions, segments, chunks and salted hot terms."""
    from lucene_ray.index.build import IndexConfig, build_index

    index_dir = str(tmp_path_factory.mktemp("index") / "idx")
    cfg = IndexConfig(
        target_rows_per_partition=150,
        partitions_per_segment=3,
        chunk_size=64,
        hot_df_threshold=300,
        n_salts=3,
    )
    manifest = build_index(corpus_file, index_dir, cfg)
    return index_dir, manifest, corpus_file


os.environ.setdefault("RAY_DEDUP_LOGS", "1")
