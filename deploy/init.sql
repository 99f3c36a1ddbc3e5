-- Monitoring schema (parity: reference init.sql; per-stage runtimes per study)
GRANT ALL PRIVILEGES ON DATABASE boa_tpu TO boa_user;

\c boa_tpu;

CREATE TABLE boa_entries (
    id SERIAL PRIMARY KEY,
    task_id VARCHAR(255) NOT NULL,
    orthanc_timestamp TIMESTAMP,
    start_timestamp TIMESTAMP,
    end_timestamp TIMESTAMP,
    study_description VARCHAR(255),
    accession_number VARCHAR(255),
    series_description VARCHAR(255),
    git_hash VARCHAR(255),
    boa_version VARCHAR(255),
    download_time FLOAT,
    inference_time FLOAT,
    num_voxels INT,
    num_slices INT,
    num_slices_resampled INT,
    bca_metrics_time FLOAT,
    totalsegmentator_metrics_time FLOAT,
    iv_contrast_phase INT,
    git_contrast FLOAT,
    bca_regions INT,
    excel_time FLOAT,
    total_time FLOAT,
    save_persistent_time FLOAT,
    computed BOOLEAN,
    UNIQUE (task_id)
);

GRANT SELECT ON boa_entries TO boa_user;
GRANT INSERT, UPDATE ON boa_entries TO boa_user;
GRANT USAGE, SELECT ON SEQUENCE boa_entries_id_seq TO boa_user;
