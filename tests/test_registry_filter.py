from __future__ import annotations

from token_etl_spark.operators.dapps import explode_registry, filter_registry


def test_filter_registry_0x38_parity(spark):
    # Extract0x38Dapp.scala:8-45 semantics: drop NFT sources, keep only
    # 0x38-chain addresses, strip the chain prefix, drop empty results.
    raw = spark.createDataFrame(
        [
            ("d1", "Swap", "i.png", ["nft", "defi"], ["0x38:0xaaa", "0x1:0xbbb"]),
            ("d2", "Lend", None, ["defi"], ["0x38:0xccc", "0x38:0xddd"]),
            ("d3", "EthOnly", "j.png", ["defi"], ["0x1:0xeee"]),
        ],
        "_id string, name string, image string, sources array<string>, contract_addresses array<string>",
    )
    out = filter_registry(raw)
    rows = {r["_id"]: r for r in out.collect()}
    assert set(rows) == {"d2"}  # d1 dropped (nft), d3 dropped (no 0x38 addrs)
    assert rows["d2"]["contract_addresses"] == ["0xccc", "0xddd"]  # prefix stripped


def test_explode_registry_one_row_per_address(spark):
    reg = spark.createDataFrame(
        [("d2", "Lend", None, ["0xccc", "0xddd"])],
        "_id string, name string, image string, contract_addresses array<string>",
    )
    out = explode_registry(reg).collect()
    assert {(r["idCMC"], r["dapp_address"]) for r in out} == {("d2", "0xccc"), ("d2", "0xddd")}
