from __future__ import annotations

from block_crawler_spark.functions.keccak import event_topic, function_selector, keccak256


def test_known_vectors():
    # public Keccak-256 test vectors / well-known Ethereum constants
    assert keccak256(b"").hex() == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert (
        event_topic("Transfer(address,address,uint256)")
        == "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )
    assert (
        event_topic("TransferSingle(address,address,address,uint256,uint256)")
        == "0xc3d58168c5ae7397731d063d5bbf3d657854427343f4c083240f7aacaa2d0f62"
    )
    assert (
        event_topic("TransferBatch(address,address,address,uint256[],uint256[])")
        == "0x4a39dc06d4c0dbc64b70af90fd698a233a518aa5d07e595d983b8c0526c8f7fb"
    )
    assert function_selector("supportsInterface(bytes4)") == "0x01ffc9a7"
    assert function_selector("tokenURI(uint256)") == "0xc87b56dd"


def test_multiblock_input():
    # > one 136-byte rate block exercises the absorb loop
    out = keccak256(b"x" * 300)
    assert len(out) == 32
    assert out.hex() == "956875d0d3af4718863b89e475911881cebd1cd08cfe3c2fcd0890d29def1e37"
