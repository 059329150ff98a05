from pyjanitor_spark.operators.clean_names import clean_names, clean_names_expr
from pyjanitor_spark.operators.complete import (
    cartesian_product,
    complete,
    expand,
    expand_grid,
    fill_missing_timestamps,
)
from pyjanitor_spark.operators.dedup import (
    bloom_build,
    contamination_score,
    bloom_dedupe_against,
    cosine_sim,
    dedupe_against,
    dedupe_exact,
    dedupe_near,
    dup_span_fraction,
    duplicated_spans,
    embedding_near_dup,
    minhash_lsh_pairs,
    minhash_band_buckets,
    minhash_signature,
    near_dup_clusters,
    ngram_jaccard_pairs,
    remove_duplicated_spans,
    simhash,
    simhash_pairs,
)
from pyjanitor_spark.operators.chemistry import (
    maccs_keys_fingerprint,
    molecular_descriptors,
    molecular_formula,
    molecular_weight,
    morgan_fingerprint,
    smiles2mol,
    smiles_descriptors,
)
from pyjanitor_spark.operators.domain import (
    convert_currency,
    convert_stock,
    convert_units,
    data_description,
    get_symbol,
    inflate_currency,
    join_apply,
    join_fasta,
    skiperror,
    skipna,
    toset,
)
from pyjanitor_spark.operators.joins import (
    asof_join,
    conditional_join,
    get_join_indices,
)
from pyjanitor_spark.operators.multimodal import (
    attach_binary,
    binary_metadata,
    decode_features,
    frame_sample,
    resize_payload,
)
from pyjanitor_spark.operators.similarity import (
    centroids,
    cosine_topk,
    hyperplane_bucket,
    ivf_topk,
    ivf_pq_topk,
    kmeans_assign,
    lsh_bucket_topk,
    pq_encode,
    pq_topk,
    pq_train,
    semdedup,
)
from pyjanitor_spark.operators.importance import dsir_weights
from pyjanitor_spark.operators.sampling import (
    deterministic_sample,
    mix_corpora,
    split_train_holdout,
    stratified_sample,
    take_token_budget,
    weighted_sample,
)
from pyjanitor_spark.operators.text_analysis import (
    assign_packs,
    chunk_text,
    extract_urls,
    fingerprint,
    gopher_repetition,
    language_id,
    ngram_lm_score,
    normalize_text,
    pii_redact,
    quality_score,
    repetition_score,
    token_count,
    top_collocations,
    top_domains,
    top_ngrams,
    url_normalize,
    word_shingles,
)
from pyjanitor_spark.operators.timeseries import (
    flag_jumps,
    sort_timestamps_monotonically,
)
from pyjanitor_spark.operators.classify import nb_score, nb_train
from pyjanitor_spark.operators.privacy import hash_columns
from pyjanitor_spark.operators.tokenize import (
    bpe_encode,
    bpe_token_count,
    bpe_train,
)
from pyjanitor_spark.operators.sketches import (
    cardinality_sketch,
    heavy_hitters,
    merge_cardinality_sketches,
)
from pyjanitor_spark.operators.vectorize import bm25_score, hashed_tfidf
from pyjanitor_spark.operators.reshape import (
    pivot_longer,
    pivot_longer_spec,
    pivot_wider,
)
from pyjanitor_spark.operators.columns import (
    also,
    change_index_dtype,
    collapse_levels,
    drop_constant_columns,
    drop_duplicate_columns,
    explode_index,
    get_columns,
    get_features_targets,
    limit_column_characters,
    move,
    remove_columns,
    rename_column,
    rename_columns,
    reorder_columns,
    row_to_names,
    select,
    select_columns,
    select_rows,
    then,
)
from pyjanitor_spark.operators.filters import (
    case_when,
    dropnotnull,
    filter_column_isin,
    filter_date,
    filter_on,
    filter_string,
    flag_nulls,
    get_dupes,
    remove_empty,
    update_where,
)
from pyjanitor_spark.operators.groupby import (
    count_cumulative_unique,
    groupby_agg,
    groupby_topk,
    shuffle,
    sort_column_value_order,
    sort_naturally,
    take_first,
)
from pyjanitor_spark.operators.missing import (
    coalesce,
    fill_direction,
    fill_empty,
    impute,
)
from pyjanitor_spark.operators.transforms import (
    add_column,
    add_columns,
    bin_numeric,
    change_type,
    concatenate_columns,
    convert_excel_date,
    convert_matlab_date,
    convert_unix_date,
    currency_column_to_numeric,
    deconcatenate_column,
    encode_categorical,
    expand_column,
    factorize_columns,
    find_replace,
    jitter,
    label_encode,
    min_max_scale,
    process_text,
    quantile_bin,
    quantiles,
    robust_scale,
    winsorize,
    round_to_fraction,
    to_datetime,
    transform_column,
    transform_columns,
    truncate_datetime_dataframe,
    unionize_dataframe_categories,
)
from pyjanitor_spark.operators.xarray_compat import (
    clone_using,
    convert_datetime_to_number,
)
