"""Power BI push-dataset sink (SURVEY S8–S11): spec/validation, batching,
refresh governor, dataset registry, REST client, provision, wipe+reload."""
