"""Mina compatibility layer: signer golden vectors, hasher, base58."""

from proof_systems_tpu.mina.base58 import (
    pubkey_from_address,
    pubkey_to_address,
    seckey_from_base58,
    seckey_to_base58,
)
from proof_systems_tpu.mina.hasher import ROInput, create_kimchi, create_legacy
from proof_systems_tpu.mina.signer import (
    NETWORK_MAINNET,
    NETWORK_TESTNET,
    Keypair,
    Signature,
    schnorr_sign,
    schnorr_verify,
)

SECKEY_B58 = "EKFXH5yESt7nsD1TJy5WNb4agVczkvzPRVexKQ8qYdNqauQRA8Ef"


def test_sign_fields_reference_vectors():
    """signer/tests/signer.rs sign_fields_test — byte parity."""
    kp = Keypair(seckey_from_base58(SECKEY_B58))
    roi = ROInput().append_field(1).append_field(2).append_field(3)

    t = schnorr_sign(kp, roi, NETWORK_TESTNET)
    assert t.rx == 20765817320000234273433345899587917625188885976914380365037035465312392849949
    assert t.s == 1002418623751815063744079415040141105602079382674393704838141255389705661040

    m = schnorr_sign(kp, roi, NETWORK_MAINNET)
    assert m.rx == 10877800556133241279092798070541266482295945495262263128372065874115589660865
    assert m.s == 7997465488592693587273287555462893250665854535708979748937792736327059812287

    assert schnorr_verify(t, kp.public, roi, NETWORK_TESTNET)
    assert schnorr_verify(m, kp.public, roi, NETWORK_MAINNET)
    assert not schnorr_verify(t, kp.public, roi, NETWORK_MAINNET)
    bad = Signature(rx=t.rx, s=(t.s + 1) % (2**254))
    assert not schnorr_verify(bad, kp.public, roi, NETWORK_TESTNET)


def test_base58_roundtrip():
    sec = seckey_from_base58(SECKEY_B58)
    assert seckey_to_base58(sec) == SECKEY_B58
    kp = Keypair(sec)
    addr = pubkey_to_address(kp.public)
    assert addr.startswith("B62")
    assert pubkey_from_address(addr) == kp.public


def test_roinput_packing():
    roi = ROInput().append_field(42).append_bool(True).append_u32(7)
    fields = roi.to_fields()
    assert fields[0] == 42
    # bits: 1 (bool) + 32 (u32) = 33 bits packed into one 254-bit field
    assert fields[1] == 1 | (7 << 1)
    raw = roi.to_bytes()
    assert len(raw) == (255 + 33 + 7) // 8


def test_hasher_domain_separation():
    roi = ROInput().append_field(5)
    h1 = create_kimchi("CodaSignature").hash(roi)
    h2 = create_kimchi("MinaSignatureMainnet").hash(roi)
    h3 = create_legacy("CodaSignature").hash(roi)
    assert len({h1, h2, h3}) == 3
    # reusable context determinism
    ctx = create_kimchi("CodaSignature")
    assert ctx.hash(roi) == h1
    assert ctx.hash(roi) == h1


def test_tx_type_currency_semantics():
    """mina-tx-type/src/currency.rs parity: u64 checked arithmetic,
    sign-magnitude Signed with zero normalized to positive."""
    from proof_systems_tpu.mina.tx_type import Amount, Fee, Sign, Signed

    a = Amount.new(720_000_000_000)
    assert a.inner() == 720_000_000_000 and not a.is_zero()
    assert Amount.new(0).is_zero()
    assert a.checked_add(Amount((1 << 64) - 1)) is None  # overflow
    assert Amount(3).checked_sub(Amount(5)) is None  # underflow
    assert Amount(5).abs_diff(Amount(3)) == Amount(2)
    assert Amount.new(Fee.new(7).inner()) == Fee(7).to_amount()

    # Signed: zero always positive; opposite signs subtract magnitudes
    assert Signed.new(Amount(0), Sign.NEG).sign is Sign.POS
    s = Signed.pos(Amount(10)).checked_add(Signed.neg(Amount(4)))
    assert s == Signed.pos(Amount(6))
    s = Signed.pos(Amount(4)).checked_add(Signed.neg(Amount(10)))
    assert s == Signed.neg(Amount(6))
    s = Signed.neg(Amount(4)).checked_sub(Signed.neg(Amount(4)))
    assert s is not None and s.is_zero() and s.is_pos()
    assert (-Signed.pos(Amount(3))).is_neg()
    assert Signed.pos(Amount((1 << 64) - 1)).checked_add(
        Signed.pos(Amount(1))
    ) is None


def test_tx_type_coinbase():
    """coinbase.rs parity: net_amount, fee-transfer presence, and the
    ROInput composition with the hasher stack."""
    from proof_systems_tpu.mina.hasher import create_kimchi
    from proof_systems_tpu.mina.tx_type import (
        Amount,
        Coinbase,
        CoinbaseFeeTransfer,
        CompressedPubKey,
        Fee,
    )
    from proof_systems_tpu.mina.signer import Keypair

    producer = CompressedPubKey.from_point(Keypair(123).public)
    worker = CompressedPubKey.from_point(Keypair(456).public)
    assert producer.decompress() == Keypair(123).public

    cb = Coinbase.new(producer, Amount.new(720_000_000_000))
    assert not cb.has_fee_transfer()
    assert cb.net_amount() == Amount(720_000_000_000)

    ft = CoinbaseFeeTransfer(worker, Fee.new(10_000_000))
    cb2 = Coinbase.with_fee_transfer(producer, Amount.new(720_000_000_000), ft)
    assert cb2.has_fee_transfer()
    assert cb2.net_amount() == Amount(720_000_000_000 - 10_000_000)
    # fee exceeding amount -> None (invalid transaction guard)
    assert Coinbase.with_fee_transfer(
        producer, Amount(5), CoinbaseFeeTransfer(worker, Fee(6))
    ).net_amount() is None

    # ROInput layout is stable and hashable under domain separation
    roi = cb2.to_roinput()
    h = create_kimchi("CoinbaseTest").hash(roi)
    assert 0 < h < __import__(
        "proof_systems_tpu.curves", fromlist=["Pallas"]
    ).Pallas.base.p
    roi2 = Coinbase.new(producer, Amount(720_000_000_000)).to_roinput()
    assert roi.to_bytes() != roi2.to_bytes()
    # deterministic bytes: same transaction serializes identically
    assert roi.to_bytes() == cb2.to_roinput().to_bytes()
