"""IO layer: datasetmaps, HDF5 frame ingest, reference-compatible writers."""
from .datasetmap import (  # noqa: F401
    DatasetMap,
    load_datasetmap,
    save_datasetmap,
    save_srb_datasetmap,
    split_dataset_map,
)
from .decode import DecodedPredictions, extract_sequences  # noqa: F401
from .h5frames import (  # noqa: F401
    FrameBatchLoader,
    FrameDatasetMetadata,
    convert_to_flat,
    create_flat_dataset_map,
    get_pdb_keys_to_filter,
)
from .writers import (  # noqa: F401
    load_prediction_matrix,
    save_consensus_probs,
    save_dict_to_fasta,
    save_encoded_labels,
    save_prediction_csv,
    save_sampled,
)
